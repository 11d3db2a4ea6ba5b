"""Elias-Fano / bitset doc-plane encoding: adaptive choice, round-trip,
host/device/pallas-path parity, search exactness (the analog of the
reference's per-block PF/EF/BITSET choice, posting_reader.rs:336-341,
elias_fano_encoder.rs:25)."""

import numpy as np
import pytest

from rucene_tpu import BooleanQuery, IndexSearcher, Term, TermQuery
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.util.packing import EF_TAG
from tests.conftest import make_docs
from tests.hitcheck import assert_hits_equal


def _segment_with_term_in(doc_flags: np.ndarray, extra: str = "filler"):
    """One segment; 'hot' appears in docs where doc_flags is True."""
    buf = SegmentBuffer()
    for present in doc_flags:
        text = ("hot " if present else "") + extra
        for d in make_docs([text]):
            buf.add_document(d)
    return pack_segment(buf.finish())


def _ef_blocks(packed):
    return np.flatnonzero(packed.blk_doc_bits >= EF_TAG)


def test_ef_chosen_for_skewed_gaps_and_roundtrips():
    # 128 docs of 'hot' spread as: mostly consecutive, one huge gap —
    # max delta forces a wide FOR width, EF wins
    flags = np.zeros(120000, bool)
    flags[:100] = True
    flags[100000:100028] = True
    packed = _segment_with_term_in(flags)
    ef = _ef_blocks(packed)
    assert len(ef) >= 1, dict(zip(packed.blk_doc_bits, packed.blk_count))
    snap = SegmentSnapshot("ef", packed)
    docs, freqs, _ = snap.read_postings("body", "hot")
    np.testing.assert_array_equal(docs, np.flatnonzero(flags))
    assert (freqs == 1).all()


def test_bitset_regime_l0():
    # dense block with occasional jumps: span <= 255 but max delta >= 8
    # -> l == 0 (pure unary/bitmap plane), smaller than FOR
    flags = np.zeros(400, bool)
    pos = 0
    for i in range(128):
        flags[pos] = True
        pos += 8 if i % 16 == 0 else 1
    packed = _segment_with_term_in(flags)
    ef = _ef_blocks(packed)
    assert len(ef) == 1
    assert int(packed.blk_doc_bits[ef[0]]) == EF_TAG  # l == 0
    snap = SegmentSnapshot("bs", packed)
    docs, freqs, _ = snap.read_postings("body", "hot")
    np.testing.assert_array_equal(docs, np.flatnonzero(flags))


def test_ef_saves_index_bytes():
    # the EF plane must actually be smaller than the FOR plane it replaced
    rng = np.random.default_rng(5)
    # 4 full blocks: runs of consecutive docs separated by ~64K gaps
    pos, at = [], 0
    for _ in range(512):
        pos.append(at)
        at += int(rng.integers(1, 3))
        if rng.random() < 0.02:
            at += 60000
    flags = np.zeros(at + 1, bool)
    flags[np.asarray(pos)] = True
    packed = _segment_with_term_in(flags)
    ef = _ef_blocks(packed)
    assert len(ef) >= 1
    l = packed.blk_doc_bits[ef] - EF_TAG
    # EF plane words < the FOR words this block would have needed
    from rucene_tpu.codec.bulk_read import read_all_postings

    docs_b, _, valid = read_all_postings(packed)
    for bi, li in zip(ef, l):
        d = docs_b[bi][valid[bi]]
        deltas = np.diff(np.concatenate([[packed.blk_base[bi]], d]))
        for_bits = max(1, int(deltas.max()).bit_length())
        assert 4 * int(li) + 12 < 4 * for_bits


def test_bulk_read_parity_with_per_term():
    rng = np.random.default_rng(17)
    flags = np.zeros(50000, bool)
    flags[np.cumsum(rng.integers(1, 400, 700)) % 50000] = True
    packed = _segment_with_term_in(flags)
    snap = SegmentSnapshot("p", packed)
    from rucene_tpu.codec.bulk_read import read_all_postings

    docs_b, freqs_b, valid = read_all_postings(packed)
    pf = packed.fields["body"]
    t = pf.term_ord["hot"]
    got = np.concatenate(
        [
            docs_b[bi][valid[bi]]
            for bi in range(
                pf.block_start[t], pf.block_start[t] + pf.block_count[t]
            )
        ]
    )
    want, _, _ = snap.read_postings("body", "hot")
    np.testing.assert_array_equal(got, want)


def test_device_decode_parity():
    import jax.numpy as jnp

    from rucene_tpu.codec.device import build_device_segment
    from rucene_tpu.ops.decode import decode_doc_blocks, decode_freq_blocks

    flags = np.zeros(200000, bool)
    flags[:64] = True
    flags[150000:150064] = True
    flags[199000] = True  # tail block stays FOR
    packed = _segment_with_term_in(flags)
    assert len(_ef_blocks(packed)) >= 1
    dev = build_device_segment(packed)
    nb = packed.num_blocks
    idx = jnp.arange(nb)
    docs, valid = decode_doc_blocks(
        dev.data,
        dev.blk_off[idx],
        dev.blk_doc_bits[idx],
        dev.blk_base[idx],
        dev.blk_count[idx],
        has_ef=True,
    )
    freqs = decode_freq_blocks(
        dev.data, dev.blk_off[idx], dev.blk_doc_bits[idx], dev.blk_freq_bits[idx], valid
    )
    from rucene_tpu.codec.bulk_read import read_all_postings

    h_docs, h_freqs, h_valid = read_all_postings(packed)
    d = np.asarray(docs)
    v = np.asarray(valid)
    np.testing.assert_array_equal(v[:nb], h_valid)
    np.testing.assert_array_equal(d[:nb][h_valid], h_docs[h_valid])
    np.testing.assert_array_equal(np.asarray(freqs)[:nb][h_valid], h_freqs[h_valid])


def _mixed_searcher(n_docs=6000, seed=33):
    """Corpus engineered so hot terms produce EF blocks: 'ef0' appears in
    runs with big jumps; plus random filler vocabulary."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n_docs):
        words = [f"w{rng.integers(0, 50)}" for _ in range(6)]
        if (i % 7 < 2) or (i % 997 == 0):
            words.append("ef0")
        if i % 3 == 0:
            words.append("ef1")
        texts.append(" ".join(words))
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    s = IndexSearcher(IndexReader([SegmentSnapshot("efmix", packed)]))
    return s, packed


def test_search_parity_with_ef_blocks():
    s, packed = _mixed_searcher()
    assert len(_ef_blocks(packed)) >= 1
    from rucene_tpu.search import host_engine

    queries = [TermQuery(Term("body", "ef0")), TermQuery(Term("body", "ef1"))]
    for a in ("ef0", "ef1", "w3"):
        for b in ("w1", "ef1"):
            bq = BooleanQuery()
            bq.must(TermQuery(Term("body", a)))
            bq.should(TermQuery(Term("body", b)))
            queries.append(bq)
            dq = BooleanQuery()
            dq.should(TermQuery(Term("body", a)))
            dq.should(TermQuery(Term("body", b)))
            queries.append(dq)
    results = s.search_batch(queries, k=25)
    doc_freqs, stats = s._gather_stats([q.rewrite() for q in queries])
    for q, got in zip(queries, results):
        per_leaf = []
        for leaf in s.reader.leaves:
            m, acc = host_engine.evaluate_query(leaf, q, s.similarity, stats, doc_freqs)
            hh = host_engine.hits_from_dense(leaf, m, acc, 25)
            per_leaf.append((leaf.doc_base, hh.docs, hh.scores, hh.total_hits))
        want = s._merge_leaf_hits(per_leaf, 25)
        assert got.total_hits == want.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in got.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )


def test_ef_survives_file_roundtrip(tmp_path):
    from rucene_tpu.codec.files import read_segment, write_segment
    from rucene_tpu.store.directory import FSDirectory

    _, packed = _mixed_searcher(n_docs=3000)
    assert len(_ef_blocks(packed)) >= 1
    d = FSDirectory(tmp_path)
    files = write_segment(d, "_ef", packed)
    packed2 = read_segment(d, "_ef")
    np.testing.assert_array_equal(packed2.blk_doc_bits, packed.blk_doc_bits)
    np.testing.assert_array_equal(packed2.data, packed.data)
    s1 = SegmentSnapshot("a", packed)
    s2 = SegmentSnapshot("b", packed2)
    for t in ("ef0", "ef1", "w2"):
        r1 = s1.read_postings("body", t)
        r2 = s2.read_postings("body", t)
        np.testing.assert_array_equal(r1[0], r2[0])
        np.testing.assert_array_equal(r1[1], r2[1])


def test_merge_preserves_ef_corpora():
    """Merging segments that contain EF blocks keeps postings exact."""
    from rucene_tpu.index.merge import merge_segments

    _, p1 = _mixed_searcher(n_docs=2000, seed=1)
    _, p2 = _mixed_searcher(n_docs=1500, seed=2)
    s1 = SegmentSnapshot("m1", p1)
    s2 = SegmentSnapshot("m2", p2)
    merged = merge_segments([s1, s2])
    snap = SegmentSnapshot("m", merged)
    for t in ("ef0", "ef1", "w0"):
        d1, f1, _ = s1.read_postings("body", t)
        d2, f2, _ = s2.read_postings("body", t)
        dm, fm, _ = snap.read_postings("body", t)
        np.testing.assert_array_equal(dm, np.concatenate([d1, d2 + p1.max_doc]))
        np.testing.assert_array_equal(fm, np.concatenate([f1, f2]))
