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
