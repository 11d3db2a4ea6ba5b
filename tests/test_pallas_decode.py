"""Pallas decode kernel vs the XLA reference decoder — bit-identical on a
real packed segment (runs the kernel in interpret mode on CPU; on TPU the
same code path is exercised compiled via the bench / searcher)."""

import numpy as np
import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import build_device_segment
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.ops import decode as xdec
from rucene_tpu.ops.pallas_decode import G, decode_work_items_pallas
from tests.conftest import make_docs, random_corpus


def _ef_heavy_segment():
    rng = np.random.default_rng(77)
    texts = random_corpus(rng, 400)
    texts = [
        t + (" efhot" if (i < 70 or 330 <= i < 390) else "")
        for i, t in enumerate(texts)
    ]
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    return pack_segment(buf.finish())


def _plain_segment():
    # uniform wide vocab: moderate deltas everywhere, FOR wins every block
    rng = np.random.default_rng(78)
    texts = [
        " ".join(f"u{int(x)}" for x in rng.integers(0, 5000, size=10))
        for _ in range(300)
    ]
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    return pack_segment(buf.finish())


def test_pallas_decode_matches_xla():
    rng = np.random.default_rng(31)
    texts = random_corpus(rng, 400)
    # skewed hot term -> guarantees Elias-Fano blocks (incl. near the
    # window edge): present in two dense runs separated by a long gap
    texts = [
        t + (" efhot" if (i < 70 or 330 <= i < 390) else "")
        for i, t in enumerate(texts)
    ]
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    dev = build_device_segment(packed)

    # the kernel branches per item on the encoding (lax.cond), so the
    # comparison covers EVERY block — FOR and EF alike
    from rucene_tpu.util.packing import EF_TAG

    assert (np.asarray(packed.blk_doc_bits) >= EF_TAG).any()
    nb = packed.num_blocks
    w = ((nb + G - 1) // G) * G
    idx = np.arange(w) % nb  # pad by repeating valid blocks
    off = jnp.asarray(np.asarray(dev.blk_off)[idx])
    dbits = jnp.asarray(np.asarray(dev.blk_doc_bits)[idx])
    fbits = jnp.asarray(np.asarray(dev.blk_freq_bits)[idx])
    base = jnp.asarray(np.asarray(dev.blk_base)[idx])
    cnt = jnp.asarray(np.asarray(dev.blk_count)[idx])

    data2d = jax.lax.bitcast_convert_type(dev.data, jnp.int32).reshape(-1, 128)
    p_docs, p_freqs, p_norms = decode_work_items_pallas(
        data2d, off, dbits, fbits, base, interpret=True
    )
    x_docs, x_valid = xdec.decode_doc_blocks(dev.data, off, dbits, base, cnt, has_ef=True)
    x_freqs = xdec.decode_freq_blocks(dev.data, off, dbits, fbits, x_valid)
    x_norms = xdec.decode_norm_blocks(dev.data, off, dbits, fbits, x_valid)

    valid = np.asarray(x_valid)
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_docs), 0), np.where(valid, np.asarray(x_docs), 0)
    )
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_freqs), 0), np.asarray(x_freqs)
    )
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_norms), 0), np.asarray(x_norms)
    )
    # inline norm bytes equal the norms-plane values at the decoded docs
    norms_plane = np.asarray(dev.norms)
    docs_np = np.asarray(x_docs)
    # all blocks here are single-field (body) rows; map block -> field via
    # the packed field tables
    body = packed.fields["body"]
    body_blocks = set()
    for t in range(len(body.terms)):
        s0 = int(body.block_start[t])
        body_blocks.update(range(s0, s0 + int(body.block_count[t])))
    for r in range(len(idx)):
        if int(idx[r]) in body_blocks:
            sel = valid[r]
            np.testing.assert_array_equal(
                np.asarray(x_norms)[r][sel],
                norms_plane[body.field_id][docs_np[r][sel]],
            )


def test_pallas_scoring_decode_matches_gather():
    """decode_score_work_items_pallas: the in-kernel one-hot cval select is
    bit-identical to the XLA cache gather on every lane (FOR + EF)."""
    from rucene_tpu.ops.pallas_decode import decode_score_work_items_pallas

    rng = np.random.default_rng(57)
    texts = random_corpus(rng, 300)
    texts = [
        t + (" efhot" if (i < 60 or 220 <= i < 280) else "")
        for i, t in enumerate(texts)
    ]
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    dev = build_device_segment(packed)

    nb = packed.num_blocks
    w = ((nb + G - 1) // G) * G
    idx = np.arange(w) % nb
    off = jnp.asarray(np.asarray(dev.blk_off)[idx])
    dbits = jnp.asarray(np.asarray(dev.blk_doc_bits)[idx])
    fbits = jnp.asarray(np.asarray(dev.blk_freq_bits)[idx])
    base = jnp.asarray(np.asarray(dev.blk_base)[idx])
    cnt = jnp.asarray(np.asarray(dev.blk_count)[idx])
    # a non-trivial multi-row cache and a varying fid column
    cache = np.abs(rng.standard_normal((3, 256))).astype(np.float32) + 0.25
    fid = jnp.asarray((np.arange(w) % 3).astype(np.int32))

    data2d = jax.lax.bitcast_convert_type(dev.data, jnp.int32).reshape(-1, 128)
    p_docs, p_freqs, p_cval = decode_score_work_items_pallas(
        data2d, off, dbits, fbits, base, fid, jnp.asarray(cache), interpret=True
    )
    x_docs, x_valid = xdec.decode_doc_blocks(dev.data, off, dbits, base, cnt, has_ef=True)
    x_freqs = xdec.decode_freq_blocks(dev.data, off, dbits, fbits, x_valid)
    x_norms = xdec.decode_norm_blocks(dev.data, off, dbits, fbits, x_valid)
    x_cval = cache.reshape(-1)[np.asarray(fid)[:, None] * 256 + np.asarray(x_norms)]

    valid = np.asarray(x_valid)
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_docs), 0), np.where(valid, np.asarray(x_docs), 0)
    )
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_freqs), 0), np.asarray(x_freqs)
    )
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_cval), 0.0), np.where(valid, x_cval, 0.0)
    )


