"""Unit tests: SmallFloat quantization and bit packing (the parity-critical
primitives; mirrors reference tests in small_float.rs and packed_simd.rs)."""

import numpy as np
import pytest

from rucene_tpu.util.packing import BLOCK_SIZE, bits_required, pack_block, unpack_block
from rucene_tpu.util.small_float import byte315_to_float, float_to_byte315, norm_table


def _origin_float_to_byte(f: np.float32) -> int:
    """Independent re-derivation (mirrors reference test oracle
    small_float.rs:57-75)."""
    if f < 0:
        return 0
    bits = int(np.float32(f).view(np.int32))
    mantissa = (bits & 0xFFFFFF) >> 21
    exponent = ((bits >> 24) & 0x7F) - 63 + 15
    if exponent > 31:
        exponent, mantissa = 31, 7
    if exponent < 0 or (exponent == 0 and mantissa == 0):
        exponent, mantissa = 0, 1
    return (exponent << 3) | mantissa


def test_small_float_known_values():
    assert int(float_to_byte315(np.float32(0.0))) == 0
    assert int(float_to_byte315(np.float32(5.8123817e-10))) == 1
    assert int(float_to_byte315(np.float32(np.finfo(np.float32).max))) == 255
    assert int(float_to_byte315(np.float32(np.inf))) == 255
    assert int(float_to_byte315(np.float32(-np.inf))) == 0
    assert int(float_to_byte315(np.float32(-1.0))) == 0
    tiny = np.float32(1.4e-45)
    assert int(float_to_byte315(tiny)) == 1


def test_small_float_random_roundtrip_against_oracle(rng):
    raw = rng.integers(0, 2**32, size=100_000, dtype=np.uint32)
    f = raw.view(np.float32)
    ok = ~np.isnan(f)
    f = f[ok]
    got = float_to_byte315(f)
    want = np.array([_origin_float_to_byte(x) for x in f[:2000]], dtype=np.uint8)
    np.testing.assert_array_equal(got[:2000], want)


def test_byte315_round_trip():
    for i in range(256):
        f = byte315_to_float(np.uint8(i))
        assert int(float_to_byte315(np.float32(f))) == i or i == 0


def test_norm_table():
    t = norm_table()
    assert t.shape == (256,)
    assert t.dtype == np.float32
    assert t[0] == np.float32(1.0) / t[255]
    # decodes of typical field lengths: byte for 1/sqrt(L) should decode near L
    for length in [1, 5, 17, 100, 1000]:
        b = int(float_to_byte315(np.float32(1.0) / np.sqrt(np.float32(length))))
        assert t[b] == pytest.approx(length, rel=0.35)


@pytest.mark.parametrize("bits", [1, 2, 3, 5, 7, 8, 13, 16, 21, 27, 31, 32])
def test_pack_unpack_roundtrip(bits, rng):
    hi = 2**bits if bits < 32 else 2**32
    vals = rng.integers(0, hi, size=BLOCK_SIZE, dtype=np.uint64).astype(np.uint32)
    words = pack_block(vals, bits)
    assert len(words) == 4 * bits
    out = unpack_block(words, bits)
    np.testing.assert_array_equal(out, vals)


def test_bits_required():
    assert bits_required(0) == 1
    assert bits_required(1) == 1
    assert bits_required(2) == 2
    assert bits_required(127) == 7
    assert bits_required(128) == 8
    assert bits_required(2**31 - 1) == 31


def test_front_coding_roundtrip():
    from rucene_tpu.util.front_coding import decode_terms, encode_terms

    terms = sorted(
        ["apple", "applesauce", "application", "banana", "band", "bandana", "café", "z" * 300]
        + [f"prefix_shared_{i:04d}" for i in range(100)]
    )
    blob = encode_terms(terms)
    assert decode_terms(blob) == terms
    # compresses shared prefixes
    raw = sum(len(t.encode()) for t in terms)
    assert len(blob) < raw
    assert decode_terms(encode_terms([])) == []
    assert decode_terms(encode_terms(["only"])) == ["only"]


def test_query_cache_recycled_id_guard():
    """A cache entry keyed by id(obj) must verify the SAME object on hit:
    a freed segment's recycled id() once served another index's doc set
    (flaky wrong-corpus filter planes under full-suite churn)."""
    from rucene_tpu.search.cache import LRUQueryCache, _AlwaysCachePolicy

    class Obj:  # weakref-able stand-in for PackedSegment
        pass

    c = LRUQueryCache(max_entries=8, policy=_AlwaysCachePolicy())
    a, b = Obj(), Obj()
    key = (1234, "s0", ("range", "f", 0, 9, None))  # same id() simulated
    va = c.get_or_compute_keyed(key, lambda: "docs-of-a", anchor=a)
    assert va == "docs-of-a"
    assert c.get_or_compute_keyed(key, lambda: "unused", anchor=a) == "docs-of-a"
    # different object behind the same key: must NOT serve a's entry
    vb = c.get_or_compute_keyed(key, lambda: "docs-of-b", anchor=b)
    assert vb == "docs-of-b"
    # anchor freed entirely: weak ref dies, entry must recompute
    del b
    import gc

    gc.collect()
    assert c.get_or_compute_keyed(key, lambda: "fresh", anchor=Obj()) == "fresh"
