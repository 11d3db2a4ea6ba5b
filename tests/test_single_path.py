"""The combine-free single-term executor path must match the dense path
exactly (scores, docs, tie order, total_hits) across segment layouts."""

import os

import numpy as np
import pytest

from rucene_tpu import Document, IndexSearcher, Term, TermQuery, TextField
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.conftest import WORDS, make_docs, random_corpus
from tests.hitcheck import assert_hits_equal




@pytest.fixture(autouse=True)
def _force_decoded_residency():
    """These tests pin the DECODED-residency machinery; since r5, small
    (floored) segments serve from the packed form under auto policy, so
    force decoded mode explicitly."""
    os.environ["RUCENE_DECODED"] = "1"
    yield
    os.environ.pop("RUCENE_DECODED", None)

def _reader(rng, n_docs, n_segments, rare_in_last=False):
    corpus = random_corpus(rng, n_docs)
    if rare_in_last:
        # a term present ONLY in the last segment (missing-leaf coverage)
        corpus[-3] += " xrareterm"
        corpus[-1] += " xrareterm xrareterm"
    bounds = np.linspace(0, n_docs, n_segments + 1).astype(int)
    snaps = []
    for si in range(n_segments):
        buf = SegmentBuffer()
        for d in make_docs(corpus[bounds[si] : bounds[si + 1]]):
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"s{si}", pack_segment(buf.finish())))
    return IndexReader(snaps)


@pytest.mark.parametrize("combine", [False, True])
@pytest.mark.parametrize("n_segments", [1, 3])
def test_single_path_matches_dense(combine, n_segments):
    rng = np.random.default_rng(101)
    reader = _reader(rng, 500, n_segments, rare_in_last=True)
    s = IndexSearcher(reader, combine_segments=combine)
    queries = [TermQuery(Term("body", w)) for w in WORDS[:10]]
    queries.append(TermQuery(Term("body", "xrareterm")))
    queries.append(TermQuery(Term("body", "zz_missing_everywhere")))

    got = s.search_batch(queries, k=17)

    # oracle: force the dense executor by running each query alongside a
    # MUST-bearing row (the batch is then not single-eligible)
    from rucene_tpu import BooleanQuery

    anchor = BooleanQuery()
    anchor.must(TermQuery(Term("body", "the")))
    anchor.must(TermQuery(Term("body", "fox")))
    want = s.search_batch(queries + [anchor], k=17)[: len(queries)]

    for q, g, w in zip(queries, got, want):
        assert g.total_hits == w.total_hits, q
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_single_path_skipped_with_deletes():
    rng = np.random.default_rng(103)
    corpus = random_corpus(rng, 200)
    buf = SegmentBuffer()
    for d in make_docs(corpus):
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    live = np.ones(packed.max_doc, bool)
    live[::5] = False
    reader = IndexReader([SegmentSnapshot("s0", packed, live=live)])
    s = IndexSearcher(reader)
    td = s.search(TermQuery(Term("body", "the")), k=10)
    # parity with the host oracle through the public API
    from rucene_tpu.search import host_engine

    rq = TermQuery(Term("body", "the")).rewrite()
    doc_freqs, stats = s._gather_stats([rq])
    hits = host_engine.execute_on_segment(
        reader.leaves[0], rq, s.similarity, stats, doc_freqs, 10
    )
    assert td.total_hits == hits.total_hits
    assert [sd.doc for sd in td.score_docs] == hits.docs.tolist()


def test_single_dec_device_expansion_parity():
    """Decoded-mode single rows take execute_flat_single_dec (work list
    expanded on device from [B] block ranges) — parity vs the packed-mode
    single path, including absent terms and mixed-df batches."""
    import os

    from rucene_tpu.search import executor as _ex

    rng = np.random.default_rng(104)
    corpus = random_corpus(rng, 1500)
    buf = SegmentBuffer()
    for d in make_docs(corpus):
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    reader = IndexReader([SegmentSnapshot("s0", packed)])
    s = IndexSearcher(reader)
    terms = sorted({w for t in corpus[:50] for w in t.split()})[:20]
    qs = [TermQuery(Term("body", t)) for t in terms]
    qs.append(TermQuery(Term("body", "zz_absent")))
    calls = [0]
    orig = _ex.execute_flat_single_dec

    def spy(*a, **k):
        calls[0] += 1
        return orig(*a, **k)

    _ex.execute_flat_single_dec = spy
    try:
        got = s.search_batch(qs, k=12)
    finally:
        _ex.execute_flat_single_dec = orig
    assert calls[0] >= 1, "decoded single path did not engage"
    os.environ["RUCENE_DECODED"] = "0"
    try:
        ref = IndexSearcher(IndexReader([SegmentSnapshot("s0", packed)])).search_batch(qs, k=12)
    finally:
        os.environ.pop("RUCENE_DECODED", None)
    for g, r in zip(got, ref):
        assert g.total_hits == r.total_hits
        assert [sd.doc for sd in g.score_docs] == [sd.doc for sd in r.score_docs]
        np.testing.assert_allclose(
            [sd.score for sd in g.score_docs],
            [sd.score for sd in r.score_docs], rtol=2e-6, atol=1e-7,
        )
