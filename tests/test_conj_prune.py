"""Exact conjunction block pruning (the skip-list/leapfrog analog,
reference skip_reader.rs:118, conjunction_scorer.rs): results must be
bit-identical with pruning, and disjoint-range conjunctions must actually
drop work."""

import numpy as np

from rucene_tpu import BooleanQuery, Document, IndexSearcher, Occur, Term, TermQuery, TextField
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.searcher import (
    build_clause_tables,
    build_flat_work,
    build_leaf_tables,
    prune_conjunctions,
)
from tests.conftest import WORDS, make_docs, random_corpus
from tests.hitcheck import assert_hits_equal


def _mixed_queries(rng, n):
    queries = []
    for i in range(n):
        w = rng.choice(WORDS, size=3, replace=False)
        q = BooleanQuery()
        kind = i % 4
        if kind == 0:
            q.must(TermQuery(Term("body", w[0])))
            q.must(TermQuery(Term("body", w[1])))
        elif kind == 1:
            q.must(TermQuery(Term("body", w[0])))
            q.should(TermQuery(Term("body", w[1])))
            q.must_not(TermQuery(Term("body", w[2])))
        elif kind == 2:
            q.should(TermQuery(Term("body", w[0])))
            q.should(TermQuery(Term("body", w[1])))
        else:
            q.filter(TermQuery(Term("body", w[0])))
            q.should(TermQuery(Term("body", w[1])))
        queries.append(q)
    return queries


def test_conjunction_pruning_is_exact_single_segment(monkeypatch):
    rng = np.random.default_rng(61)
    buf = SegmentBuffer()
    for d in make_docs(random_corpus(rng, 600)):
        buf.add_document(d)
    reader = IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])
    s = IndexSearcher(reader)
    queries = _mixed_queries(rng, 24)
    want = None
    # baseline: disable pruning by patching it to identity
    import rucene_tpu.search.searcher as sm

    real = sm.prune_conjunctions
    monkeypatch.setattr(sm, "prune_conjunctions", lambda w, nr, br: (w, 0))
    want = s.search_batch(queries, k=15)
    monkeypatch.setattr(sm, "prune_conjunctions", real)
    got = s.search_batch(queries, k=15)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_conjunction_pruning_is_exact_combined_view(monkeypatch):
    rng = np.random.default_rng(67)
    corpus = random_corpus(rng, 500)
    snaps = []
    for i in range(5):
        buf = SegmentBuffer()
        for d in make_docs(corpus[i * 100 : (i + 1) * 100]):
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"c{i}", pack_segment(buf.finish())))
    reader = IndexReader(snaps)
    s = IndexSearcher(reader, combine_segments=True)
    queries = _mixed_queries(rng, 16)
    import rucene_tpu.search.searcher as sm

    real = sm.prune_conjunctions
    monkeypatch.setattr(sm, "prune_conjunctions", lambda w, nr, br: (w, 0))
    want = s.search_batch(queries, k=12)
    monkeypatch.setattr(sm, "prune_conjunctions", real)
    got = s.search_batch(queries, k=12)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_disjoint_ranges_prune_most_blocks():
    """Term A appears only in the first 1/8 of docs, term B only in the
    last 1/8: an AND of the two should decode far fewer blocks than the
    full work list (VERDICT: <30% of blocks on AND-heavy batches)."""
    n = 4096
    buf = SegmentBuffer()
    for i in range(n):
        toks = ["common"]
        if i < n // 8:
            toks.append("alpha")
        if i >= 7 * n // 8:
            toks.append("beta")
        d = Document()
        d.add(TextField("body", " ".join(toks)))
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    leaf = SegmentSnapshot("s0", packed)
    reader = IndexReader([leaf])
    s = IndexSearcher(reader)

    q = BooleanQuery()
    q.must(TermQuery(Term("body", "alpha")))
    q.must(TermQuery(Term("body", "beta")))
    rqs = [q.rewrite()]
    doc_freqs, stats = s._gather_stats(rqs)
    weight, occur, n_required, min_should, _, _ = build_clause_tables(
        rqs, s.similarity, doc_freqs, stats, 1, 2
    )
    bs, bc, fid = build_leaf_tables(leaf, rqs, 1, 2)
    work = build_flat_work(bs, bc, weight, fid, occur)
    n_before = work[6]
    pruned, dropped = prune_conjunctions(work, n_required, (packed.blk_first_doc, packed.blk_last_doc))
    assert dropped == n_before  # fully disjoint: EVERYTHING prunable
    # and the search is still exact
    td = s.search(q, k=10)
    assert td.total_hits == 0

    # overlapping conjunction: common AND alpha keeps only alpha-range blocks
    q2 = BooleanQuery()
    q2.must(TermQuery(Term("body", "common")))
    q2.must(TermQuery(Term("body", "alpha")))
    rqs = [q2.rewrite()]
    doc_freqs, stats = s._gather_stats(rqs)
    weight, occur, n_required, min_should, _, _ = build_clause_tables(
        rqs, s.similarity, doc_freqs, stats, 1, 2
    )
    bs, bc, fid = build_leaf_tables(leaf, rqs, 1, 2)
    work = build_flat_work(bs, bc, weight, fid, occur)
    pruned, dropped = prune_conjunctions(work, n_required, (packed.blk_first_doc, packed.blk_last_doc))
    assert dropped > 0
    assert pruned[6] < 0.3 * work[6]
    td = s.search(q2, k=10)
    assert td.total_hits == n // 8


def test_missing_required_term_drops_row():
    rng = np.random.default_rng(71)
    buf = SegmentBuffer()
    for d in make_docs(random_corpus(rng, 200)):
        buf.add_document(d)
    leaf = SegmentSnapshot("s0", pack_segment(buf.finish()))
    s = IndexSearcher(IndexReader([leaf]))
    q = BooleanQuery()
    q.must(TermQuery(Term("body", "the")))
    q.must(TermQuery(Term("body", "zzz_not_present")))
    q.should(TermQuery(Term("body", "fox")))
    td = s.search(q, k=10)
    assert td.total_hits == 0
