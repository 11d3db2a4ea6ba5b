"""Device phrase pipeline vs host engine: exact parity on random corpora,
overflow fallback correctness."""

import numpy as np

from rucene_tpu import IndexSearcher, PhraseQuery
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.conftest import make_docs, random_corpus
from tests.hitcheck import assert_hits_equal
from rucene_tpu.util.metrics import METRICS


def _searcher(texts):
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    return IndexSearcher(IndexReader([SegmentSnapshot("ph", pack_segment(buf.finish()))]))


def _host_result(s, q, k):
    from rucene_tpu.search import host_engine

    doc_freqs, stats = s._gather_stats_query(q)
    per_leaf = []
    for leaf in s.reader.leaves:
        m, acc = host_engine.evaluate_query(leaf, q, s.similarity, stats, doc_freqs)
        hh = host_engine.hits_from_dense(leaf, m, acc, k)
        per_leaf.append((leaf.doc_base, hh.docs, hh.scores, hh.total_hits))
    return s._merge_leaf_hits(per_leaf, k)


def test_device_phrase_matches_host():
    rng = np.random.default_rng(606)
    texts = random_corpus(rng, 500)
    s = _searcher(texts)
    METRICS.reset()
    tried = 0
    for i in range(30):
        d = texts[i].split()
        if len(d) < 3:
            continue
        pos = int(rng.integers(0, len(d) - 2))
        terms = [d[pos], d[pos + 1]]
        if i % 3 == 0 and pos + 2 < len(d):
            terms.append(d[pos + 2])
        q = PhraseQuery("body", terms)
        got = s.search(q, k=15)
        want = _host_result(s, q, 15)
        assert got.total_hits == want.total_hits, terms
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in got.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )
        tried += 1
    assert tried >= 20
    snap = METRICS.snapshot()["counters"]
    assert snap.get("search.phrase_device", 0) >= tried


def test_device_phrase_overflow_falls_back():
    # >32 occurrences of the first term in one doc forces the host fallback
    texts = ["hot " * 80 + "spot cold"] + ["hot spot here"] * 5 + ["hot cold"] * 3
    s = _searcher(texts)
    METRICS.reset()
    q = PhraseQuery("body", ["hot", "spot"])
    got = s.search(q, k=10)
    want = _host_result(s, q, 10)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )
    assert METRICS.snapshot()["counters"].get("search.phrase_host_fallback", 0) > 0


def test_phrase_with_repeated_term():
    texts = ["to be or not to be that is", "be to or to be", "not to be"]
    s = _searcher(texts)
    q = PhraseQuery("body", ["to", "be"])
    got = s.search(q, k=10)
    want = _host_result(s, q, 10)
    assert got.total_hits == want.total_hits == 3
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )


def test_sloppy_phrase():
    texts = [
        "quick brown fox",          # exact
        "quick red brown fox",      # 'quick ... fox' needs crossing 'red brown'
        "quick fox",                # gap 0 for (quick, fox)? adjacent
        "fox quick",                # wrong order
        "quick a b c d fox",        # gap 4
    ]
    s = _searcher(texts)
    exact = s.search(PhraseQuery("body", ["quick", "fox"]), k=10)
    assert sorted(sd.doc for sd in exact.score_docs) == [2]
    s1 = s.search(PhraseQuery("body", ["quick", "fox"], slop=2), k=10)
    assert sorted(sd.doc for sd in s1.score_docs) == [0, 1, 2]
    s4 = s.search(PhraseQuery("body", ["quick", "fox"], slop=4), k=10)
    assert sorted(sd.doc for sd in s4.score_docs) == [0, 1, 2, 4]
    # tighter matches score higher (sloppy freq 1/(d+1))
    by_doc = {sd.doc: sd.score for sd in s4.score_docs}
    assert by_doc[2] > by_doc[0] > by_doc[4]


def test_device_sloppy_phrase_matches_host():
    """Sloppy phrases run on the device kernel and match the host oracle
    bit-for-bit (histogram-ordered sloppy-freq accumulation)."""
    rng = np.random.default_rng(909)
    texts = random_corpus(rng, 400)
    s = _searcher(texts)
    METRICS.reset()
    tried = 0
    for i in range(24):
        d = texts[i].split()
        if len(d) < 4:
            continue
        pos = int(rng.integers(0, len(d) - 3))
        # skip a word so exact rarely matches and slop does the work
        terms = [d[pos], d[pos + 2]]
        if i % 4 == 0:
            terms.append(d[pos + 3])
        slop = int(rng.integers(1, 6))
        q = PhraseQuery("body", terms, slop=slop)
        got = s.search(q, k=15)
        want = _host_result(s, q, 15)
        assert got.total_hits == want.total_hits, (terms, slop)
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in got.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )
        tried += 1
    assert tried >= 15
    snap = METRICS.snapshot()["counters"]
    assert snap.get("search.phrase_device", 0) >= tried


def test_mixed_exact_and_sloppy_batch():
    """A batch mixing slop=0 and slop>0 rows stays exact for both."""
    rng = np.random.default_rng(910)
    texts = random_corpus(rng, 300)
    s = _searcher(texts)
    d0, d1 = texts[0].split(), texts[1].split()
    queries = [
        PhraseQuery("body", [d0[0], d0[1]]),
        PhraseQuery("body", [d1[0], d1[2]], slop=3),
        PhraseQuery("body", [d0[1], d0[2]]),
        PhraseQuery("body", [d1[1], d1[3]], slop=2),
    ]
    got = s.search_batch(queries, k=10)
    for q, g in zip(queries, got):
        want = _host_result(s, q, 10)
        assert g.total_hits == want.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )
