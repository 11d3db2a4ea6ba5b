"""Codec round-trip: inversion -> pack_segment -> host/device decode."""

import numpy as np

from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import SegmentSnapshot
from tests.conftest import make_docs


def _brute_force_postings(texts, term):
    docs, freqs, pos = [], [], []
    for i, t in enumerate(texts):
        toks = t.lower().split()
        positions = [p for p, w in enumerate(toks) if w == term]
        if positions:
            docs.append(i)
            freqs.append(len(positions))
            pos.extend(positions)
    return np.array(docs), np.array(freqs), np.array(pos)


def test_pack_roundtrip_small(small_index):
    seg, texts = small_index
    packed = pack_segment(seg)
    snap = SegmentSnapshot("s0", packed)
    field = packed.fields["body"]
    for term in list(field.terms):
        want_docs, want_freqs, want_pos = _brute_force_postings(texts, term)
        got = snap.read_postings("body", term, with_positions=True)
        assert got is not None, term
        docs, freqs, positions = got
        np.testing.assert_array_equal(docs, want_docs, err_msg=term)
        np.testing.assert_array_equal(freqs, want_freqs, err_msg=term)
        np.testing.assert_array_equal(positions, want_pos, err_msg=term)


def test_term_stats(small_index):
    seg, texts = small_index
    packed = pack_segment(seg)
    field = packed.fields["body"]
    total_tokens = sum(len(t.split()) for t in texts)
    assert int(field.total_tf.sum()) == total_tokens
    assert packed.stats["body"].doc_count == len(texts)
    assert packed.stats["body"].sum_total_term_freq == total_tokens


def test_device_decode_matches_host(small_index):
    import jax.numpy as jnp

    from rucene_tpu.codec.device import build_device_segment
    from rucene_tpu.ops.decode import decode_doc_blocks, decode_freq_blocks

    seg, texts = small_index
    packed = pack_segment(seg)
    snap = SegmentSnapshot("s0", packed)
    dev = build_device_segment(packed)

    nb = packed.num_blocks
    idx = jnp.arange(nb)
    docs, valid = decode_doc_blocks(
        dev.data, dev.blk_off[idx], dev.blk_doc_bits[idx], dev.blk_base[idx], dev.blk_count[idx]
    )
    freqs = decode_freq_blocks(
        dev.data, dev.blk_off[idx], dev.blk_doc_bits[idx], dev.blk_freq_bits[idx], valid
    )
    docs = np.asarray(docs)
    freqs = np.asarray(freqs)

    field = packed.fields["body"]
    for term, ord_ in field.term_ord.items():
        start, cnt = int(field.block_start[ord_]), int(field.block_count[ord_])
        got_docs = []
        got_freqs = []
        for b in range(start, start + cnt):
            c = int(packed.blk_count[b])
            got_docs.extend(docs[b, :c].tolist())
            got_freqs.extend(freqs[b, :c].tolist())
        host = snap.read_postings("body", term)
        np.testing.assert_array_equal(got_docs, host[0], err_msg=term)
        np.testing.assert_array_equal(got_freqs, host[1], err_msg=term)


def test_multi_field_and_norms():
    texts = ["alpha beta beta", "beta gamma", "alpha"]
    buf = SegmentBuffer()
    for d in make_docs(texts, ids=["a", "b", "c"]):
        buf.add_document(d)
    seg = buf.finish()
    packed = pack_segment(seg)
    assert set(packed.fields) == {"body", "id"}
    snap = SegmentSnapshot("s0", packed)
    # StringField is not tokenized: exact value, omit norms
    assert snap.read_postings("id", "a")[0].tolist() == [0]
    assert "id" not in packed.norms
    # norms present for body field, byte of 1/sqrt(len)
    from rucene_tpu.util.small_float import float_to_byte315

    want = [int(float_to_byte315(np.float32(1.0) / np.sqrt(np.float32(n)))) for n in (3, 2, 1)]
    np.testing.assert_array_equal(packed.norms["body"], want)
    # stored fields
    assert snap.document(1)["id"] == "b"
    assert snap.document(2)["raw"] == "alpha"
