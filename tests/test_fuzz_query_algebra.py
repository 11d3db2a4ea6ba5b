"""Catch-all differential fuzz over the full query algebra: random query
trees (terms, booleans with min_should_match, phrases incl. sloppy and
gapped, prefix/range/exists, dismax, const-score, boosting, spans) run
through the normal routed search_batch and must match the exact recursive
host evaluator on every doc and score."""

from __future__ import annotations

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.doc.term import Term
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.spans import SpanNearQuery, SpanOrQuery, SpanTermQuery
from tests.hitcheck import assert_hits_equal

VOCAB = [f"w{i}" for i in range(30)]


def _reader(n=350, n_segments=2, seed=101):
    rng = np.random.default_rng(seed)
    probs = 1.0 / np.arange(1, 31) ** 1.1
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(VOCAB, size=int(rng.integers(4, 22)), p=probs))
        for _ in range(n)
    ]
    bounds = np.linspace(0, n, n_segments + 1).astype(int)
    snaps = []
    for si in range(n_segments):
        buf = SegmentBuffer()
        for di in range(bounds[si], bounds[si + 1]):
            d = rt.Document()
            d.add(rt.TextField("body", texts[di]))
            d.add(rt.IntPoint("num", di % 60))
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"s{si}", pack_segment(buf.finish())))
    return IndexReader(snaps), texts


def _rand_term(rng):
    return rt.TermQuery(
        Term("body", VOCAB[int(rng.integers(0, 25))]),
        boost=float(rng.choice([1.0, 1.0, 2.0, 0.5])),
    )


def _rand_phrase(rng, texts):
    t = texts[int(rng.integers(0, len(texts)))].split()
    if len(t) < 3:
        return _rand_term(rng)
    j = int(rng.integers(0, len(t) - 2))
    kind = int(rng.integers(0, 3))
    if kind == 0:
        return rt.PhraseQuery("body", [t[j], t[j + 1]])
    if kind == 1:
        return rt.PhraseQuery("body", [t[j], t[j + 1]], slop=int(rng.integers(1, 4)))
    return rt.PhraseQuery("body", [t[j], t[j + 2]], positions=[0, 2])  # gapped


def _rand_leafq(rng, texts):
    kind = int(rng.integers(0, 7))
    if kind <= 1:
        return _rand_term(rng)
    if kind == 2:
        return _rand_phrase(rng, texts)
    if kind == 3:
        lo = int(rng.integers(0, 40))
        return rt.PointRangeQuery("num", lo, lo + int(rng.integers(5, 25)))
    if kind == 4:
        return rt.PrefixQuery("body", f"w{rng.integers(1, 3)}")
    if kind == 5:
        members = rng.choice(25, size=2, replace=False)
        return rt.DisjunctionMaxQuery(
            [rt.TermQuery(Term("body", VOCAB[int(m)])) for m in members],
            tie_breaker=float(rng.choice([0.0, 0.3])),
        )
    ts = rng.choice(20, size=2, replace=False)
    return SpanNearQuery(
        [SpanTermQuery(Term("body", VOCAB[int(t)])) for t in ts],
        slop=int(rng.integers(0, 6)),
        in_order=bool(rng.integers(0, 2)),
    )


def _rand_query(rng, texts, depth=0):
    if depth >= 1 or rng.random() < 0.35:
        return _rand_leafq(rng, texts)
    bq = rt.BooleanQuery(min_should_match=int(rng.integers(0, 2)))
    n = int(rng.integers(2, 5))
    occs = [rt.Occur.SHOULD, rt.Occur.SHOULD, rt.Occur.MUST, rt.Occur.FILTER,
            rt.Occur.MUST_NOT]
    n_pos = 0
    for _ in range(n):
        occ = occs[int(rng.integers(0, len(occs)))]
        sub = _rand_query(rng, texts, depth + 1)
        if occ != rt.Occur.MUST_NOT:
            n_pos += 1
        bq.add(sub, occ)
    if n_pos == 0:  # all-negative boolean matches nothing; keep it solvable
        bq.add(_rand_term(rng), rt.Occur.SHOULD)
    return bq


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_routed_vs_host(seed):
    reader, texts = _reader(seed=100 + seed)
    s = rt.IndexSearcher(reader)
    rng = np.random.default_rng(seed)
    queries = [_rand_query(rng, texts) for _ in range(40)]
    got = s.search_batch(queries, k=20)
    for qi, (q, g) in enumerate(zip(queries, got)):
        try:
            w = s._search_host(q, 20)
        except NotImplementedError:
            continue  # documented unsupported shapes keep raising uniformly
        assert g.total_hits == w.total_hits, (qi, q)
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
            rtol=2e-6,
        )


def test_fuzz_combined_view_vs_host():
    """Same fuzz through the single-dispatch combined view (the NRT
    serving configuration)."""
    from rucene_tpu.index import combined as combined_mod

    reader, texts = _reader(n=400, n_segments=4, seed=207)
    s = rt.IndexSearcher(reader, combine_segments=True)
    rng = np.random.default_rng(9)
    queries = [_rand_query(rng, texts) for _ in range(30)]
    got = s.search_batch(queries, k=15)
    for qi, (q, g) in enumerate(zip(queries, got)):
        try:
            w = s._search_host(q, 15)
        except NotImplementedError:
            continue
        assert g.total_hits == w.total_hits, (qi, q)
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
            rtol=2e-6,
        )
    combined_mod._VIEW_CACHE.clear()


def test_fuzz_sharded_vs_single():
    """Fuzz rows the sharded searcher claims to serve must match the
    single-process searcher on the 8-device mesh (rows it cannot express
    fall back internally — still compared)."""
    from rucene_tpu.parallel.sharded import (
        ShardedIndex,
        ShardedSearcher,
        make_mesh,
    )

    reader, texts = _reader(n=320, n_segments=4, seed=303)
    mesh = make_mesh(4, 2)
    sh = ShardedSearcher(ShardedIndex(mesh, reader))
    single = rt.IndexSearcher(reader)
    rng = np.random.default_rng(17)
    queries = [_rand_query(rng, texts) for _ in range(24)]
    got = sh.search_batch(queries, k=12)
    want = single.search_batch(queries, k=12)
    for qi, (g, w) in enumerate(zip(got, want)):
        assert g.total_hits == w.total_hits, (qi, queries[qi])
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
            rtol=2e-6,
        )
