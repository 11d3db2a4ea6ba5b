"""Both executor top-k strategies (dense and candidate-sort) must agree:
the strategy switches on static shapes (b*md vs work lanes), so force each
side of the threshold and cross-check, including heavy score ties."""

import numpy as np

from rucene_tpu import BooleanQuery, IndexSearcher, Term, TermQuery
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.conftest import WORDS, make_docs, random_corpus
from tests.hitcheck import assert_hits_equal
from tests.oracle import OracleIndex


def _searcher(texts):
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    return IndexSearcher(IndexReader([SegmentSnapshot("s", pack_segment(buf.finish()))]))


def test_candidate_path_matches_oracle():
    # 3000 docs -> md_pad=3072; single-term queries have tiny work lists, so
    # b*md > 12*L forces the candidate-sort branch
    rng = np.random.default_rng(77)
    texts = random_corpus(rng, 3000)
    s = _searcher(texts)
    o = OracleIndex(texts)
    for term in ["fox", "tensor", "merge", "quick", "segment"]:
        td = s.search(TermQuery(Term("body", term)), k=25)
        want, total = o.search_term(term, 25)
        assert td.total_hits == total, term
        assert_hits_equal([(sd.doc, sd.score) for sd in td.score_docs], want)


def test_candidate_path_boolean_and_ties():
    rng = np.random.default_rng(78)
    # heavy ties: identical docs -> identical scores -> doc-id tie-break
    texts = ["tie tie word"] * 500 + random_corpus(rng, 2600)
    s = _searcher(texts)
    o = OracleIndex(texts)
    td = s.search(TermQuery(Term("body", "tie")), k=20)
    want, total = o.search_term("tie", 20)
    assert td.total_hits == total == 500
    # exact tie-break: first 20 doc ids in ascending order
    assert [sd.doc for sd in td.score_docs] == list(range(20))

    q = BooleanQuery()
    q.must(TermQuery(Term("body", "fox")))
    q.should(TermQuery(Term("body", "dog")))
    td2 = s.search(q, k=30)
    want2, total2 = o.search_bool(["fox"], ["dog"], [], 30)
    assert td2.total_hits == total2
    assert_hits_equal([(sd.doc, sd.score) for sd in td2.score_docs], want2)


def test_more_matches_than_k():
    rng = np.random.default_rng(79)
    texts = random_corpus(rng, 2500)
    s = _searcher(texts)
    td = s.search(TermQuery(Term("body", "the")), k=5)
    assert len(td.score_docs) == 5
    assert td.total_hits > 5
    scores = [sd.score for sd in td.score_docs]
    assert scores == sorted(scores, reverse=True)


def test_pure_disjunction_flag_identical():
    """The pure-disjunction executor fast path (skips the clause-count
    accumulator) must return bit-identical results on qualifying batches,
    in BOTH combine strategies (dense scatter and candidate scan)."""
    import jax

    from rucene_tpu.search.executor import execute_flat_impl

    rng = np.random.default_rng(77)
    texts = random_corpus(rng, 600)
    s = _searcher(texts)
    queries = []
    for _ in range(8):
        q = BooleanQuery()
        for wd in rng.choice(WORDS, size=int(rng.integers(1, 4)), replace=False):
            q.should(TermQuery(Term("body", str(wd))))
        queries.append(q)
    rqs = [q.rewrite() for q in queries]
    from rucene_tpu.search.searcher import (
        build_clause_tables,
        build_flat_work,
        build_leaf_cache,
        build_leaf_tables,
    )

    doc_freqs, stats = s._gather_stats(rqs)
    weight, occur, n_req, min_should, _, _ = build_clause_tables(
        rqs, s.similarity, doc_freqs, stats, 8, 4
    )
    leaf = s.reader.leaves[0]
    cache = build_leaf_cache(leaf, s.similarity, stats)
    bs, bc, fid = build_leaf_tables(leaf, rqs, 8, 4)
    work = build_flat_work(bs, bc, weight, fid, occur)
    import jax.numpy as jnp
    from rucene_tpu.search.executor import FlatQueryBatch

    fq = FlatQueryBatch(
        *[jnp.asarray(a) for a in work[:6]],
        n_required=jnp.asarray(n_req),
        min_should=jnp.asarray(min_should),
        cache=jnp.asarray(cache),
    )
    for dev in (leaf.device,):
        a = jax.jit(execute_flat_impl, static_argnames=("k", "pure_disjunction"))(
            dev, fq, k=12, pure_disjunction=False
        )
        b = jax.jit(execute_flat_impl, static_argnames=("k", "pure_disjunction"))(
            dev, fq, k=12, pure_disjunction=True
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pruned_matches_exact():
    """Block-max pruning must return the identical top-k (docs and scores)
    as exhaustive evaluation; only total_hits may drop to a lower bound."""
    rng = np.random.default_rng(404)
    # skewed impact distribution: a few high-tf docs up front, a long tail
    # of tf=1 blocks whose upper bound cannot reach the top-10 threshold
    texts = ["boost boost boost boost boost pad pad pad" for _ in range(300)]
    texts += ["boost pad pad pad pad pad pad pad" for _ in range(3700)]
    texts += random_corpus(rng, 500)
    s = _searcher(texts)
    queries = [TermQuery(Term("body", "boost")), TermQuery(Term("body", "pad"))]
    q_or = BooleanQuery()
    q_or.should(TermQuery(Term("body", "boost")))
    q_or.should(TermQuery(Term("body", "fox")))
    queries.append(q_or)
    exact = s.search_batch(queries, k=10)
    pruned = s.search_batch(queries, k=10, prune=True)
    for e, p in zip(exact, pruned):
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in p.score_docs],
            [(sd.doc, sd.score) for sd in e.score_docs],
        )
        assert p.total_hits <= e.total_hits
    from rucene_tpu.util.metrics import METRICS

    assert METRICS.snapshot()["counters"].get("search.pruned_blocks", 0) > 0


def test_pruned_safe_on_uniform_ties():
    """Uniform corpora give every block the same upper bound: pruning must
    detect the unsafe skip and fall back to full evaluation."""
    rng = np.random.default_rng(405)
    texts = random_corpus(rng, 3000)
    s = _searcher(texts)
    queries = [TermQuery(Term("body", w)) for w in ["the", "fox", "dog"]]
    exact = s.search_batch(queries, k=10)
    pruned = s.search_batch(queries, k=10, prune=True)
    for e, p in zip(exact, pruned):
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in p.score_docs],
            [(sd.doc, sd.score) for sd in e.score_docs],
        )
