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
    s.PHRASE_SCALAR_MAX_DOCS = 0  # pin the device pipeline, not the scalar shortcut
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
    s.PHRASE_SCALAR_MAX_DOCS = 0  # pin the device pipeline, not the scalar shortcut
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


def test_phrase_pruning_and_heavy_row_admission():
    """Common x rare phrases prune the common term's blocks (block-interval
    leapfrog, skip_reader.rs:118 analog); common x common rows exceed the
    device budget and batch into the scalar engine — both stay exact."""
    rng = np.random.default_rng(77)
    # 'hot' appears in every doc; 'cold' in few; docs are long enough that
    # hot spans many blocks
    texts = []
    for i in range(3000):
        words = ["hot"] + [f"w{int(rng.integers(0, 30))}" for _ in range(12)]
        if i % 499 == 0:
            words.insert(1, "cold")  # "hot cold" appears as a bigram
        texts.append(" ".join(words))
    s = _searcher(texts)
    s.PHRASE_SCALAR_MAX_DOCS = 0  # pin the device pipeline, not the scalar shortcut
    s.PHRASE_ROW_ITEM_BUDGET = 8  # force the hot x hot row onto the scalar path
    before = METRICS.snapshot()["counters"]
    queries = [
        PhraseQuery("body", ["hot", "cold"]),  # prunable: rare second term
        PhraseQuery("body", ["hot", "w3"]),  # heavy: both common
    ]
    got = s.search_batch(queries, k=10)
    after = METRICS.snapshot()["counters"]
    assert after.get("search.phrase_pruned_blocks", 0) > before.get(
        "search.phrase_pruned_blocks", 0
    ), "common x rare phrase did not prune the common term's blocks"
    heavy_served = (
        after.get("search.phrase_plane", 0) - before.get("search.phrase_plane", 0)
    ) + (
        after.get("search.phrase_host_fallback", 0)
        - before.get("search.phrase_host_fallback", 0)
    )
    assert heavy_served > 0, "heavy row took neither the plane nor scalar path"
    for q, g in zip(queries, got):
        want = _host_result(s, q, 10)
        assert g.total_hits == want.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )


def test_phrase_plane_path_parity():
    """Heavy exact phrases via dense position planes (ops/phrase_plane):
    parity with the host oracle, incl. term reuse across rows and 3-term
    phrases. Budgets forced to 0 so every row takes the plane path."""
    rng = np.random.default_rng(303)
    texts = []
    for i in range(2500):
        words = [f"w{int(x) % 25}" for x in rng.zipf(1.3, size=int(rng.integers(6, 20)))]
        texts.append(" ".join(words))
    s = _searcher(texts)
    s.PHRASE_SCALAR_MAX_DOCS = 0  # pin the device pipeline, not the scalar shortcut
    s.PHRASE_ROW_DF_BUDGET = 0  # force heavy classification
    before = METRICS.snapshot()["counters"]
    queries = [
        PhraseQuery("body", ["w1", "w2"]),
        PhraseQuery("body", ["w0", "w1"]),
        PhraseQuery("body", ["w1", "w2", "w3"]),
        PhraseQuery("body", ["w2", "w2"]),  # repeated term
    ]
    got = s.search_batch(queries, k=15)
    after = METRICS.snapshot()["counters"]
    assert after.get("search.phrase_plane", 0) - before.get("search.phrase_plane", 0) >= 4
    for q, g in zip(queries, got):
        want = _host_result(s, q, 15)
        assert g.total_hits == want.total_hits, q.terms
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )
    # plane cache reuse: same terms again should hit the device cache
    from rucene_tpu.search.searcher import _PLANE_CACHE

    n_planes = len(_PLANE_CACHE)
    s.search_batch([PhraseQuery("body", ["w1", "w2"])], k=5)
    assert len(_PLANE_CACHE) == n_planes


def test_phrase_plane_overflow_doc_spills_exactly():
    """A doc with positions beyond PMAX (>=128 tokens) forces the row off
    the plane path; results stay exact via the scalar spill."""
    rng = np.random.default_rng(304)
    texts = [" ".join(f"w{int(rng.integers(0, 6))}" for _ in range(10)) for _ in range(400)]
    # one LONG doc whose matching bigram sits past position 128
    texts.append(" ".join(["filler"] * 150) + " w1 w2")
    s = _searcher(texts)
    s.PHRASE_ROW_DF_BUDGET = 0
    q = PhraseQuery("body", ["w1", "w2"])
    got = s.search_batch([q], k=10)[0]
    want = _host_result(s, q, 10)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )


def test_phrase_plane_with_deletes():
    rng = np.random.default_rng(305)
    texts = [" ".join(f"w{int(rng.integers(0, 8))}" for _ in range(12)) for _ in range(600)]
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    live = np.ones(packed.max_doc, bool)
    live[rng.integers(0, packed.max_doc, size=80)] = False
    reader = IndexReader([SegmentSnapshot("s0", packed, live=live)])
    s = IndexSearcher(reader)
    s.PHRASE_ROW_DF_BUDGET = 0
    q = PhraseQuery("body", ["w1", "w3"])
    got = s.search_batch([q], k=10)[0]
    want = _host_result(s, q, 10)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )


def test_phrase_plane_mid_row_routing():
    """Mid-weight exact phrases (fit the candidate budget but exceed
    PHRASE_PLANE_ITEM_MIN blocks) route to the position-plane path when
    the corpus is large enough — parity with the host oracle."""
    rng = np.random.default_rng(306)
    texts = []
    for i in range(3000):
        words = [f"w{int(x) % 30}" for x in rng.zipf(1.4, size=int(rng.integers(6, 24)))]
        texts.append(" ".join(words))
    s = _searcher(texts)
    s.PHRASE_SCALAR_MAX_DOCS = 0  # pin the device pipeline, not the scalar shortcut
    s.PHRASE_PLANE_MIN_DOCS = 0  # small test corpus qualifies
    s.PHRASE_PLANE_ITEM_MIN = 1  # any selected work routes to planes
    before = METRICS.snapshot()["counters"]
    queries = [
        PhraseQuery("body", ["w1", "w2"]),
        PhraseQuery("body", ["w3", "w1", "w0"]),
        PhraseQuery("body", ["w9", "w4"]),
    ]
    got = s.search_batch(queries, k=12)
    after = METRICS.snapshot()["counters"]
    assert after.get("search.phrase_plane", 0) - before.get("search.phrase_plane", 0) >= 3
    for q, g in zip(queries, got):
        want = _host_result(s, q, 12)
        assert g.total_hits == want.total_hits, q.terms
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )


def test_small_leaf_phrase_scalar_shortcut():
    """Below PHRASE_SCALAR_MAX_DOCS, exact phrase rows route to the batched
    scalar C++ engine (BENCH_r02: the device pipeline's per-row host tax
    lost 70x to the scalar engine at 50K docs) — with identical hits,
    including the lone-SHOULD-inside-boolean form (mm bump is satisfied by
    the engine's phrase promotion, not double-required)."""
    import rucene_tpu as rt

    rng = np.random.default_rng(77)
    texts = random_corpus(rng, 800)
    s = _searcher(texts)
    assert s.PHRASE_SCALAR_MAX_DOCS > 800  # default routes small leaves
    s_dev = _searcher(texts)
    s_dev.PHRASE_SCALAR_MAX_DOCS = 0
    queries = []
    for i in range(12):
        d = texts[i].split()
        if len(d) < 2:
            continue
        pos = int(rng.integers(0, len(d) - 1))
        queries.append(PhraseQuery("body", [d[pos], d[pos + 1]]))
    bq = rt.BooleanQuery()
    bq.add(PhraseQuery("body", queries[0].terms), rt.Occur.SHOULD)
    queries.append(bq)
    METRICS.reset()
    got = s.search_batch(queries, k=10)
    routed = METRICS.snapshot()["counters"].get("search.phrase_scalar_route", 0)
    assert routed >= len(queries), f"expected scalar routing, got {routed}"
    want = s_dev.search_batch(queries, k=10)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_phrase_plane_sliced_build_parity(monkeypatch):
    """Terms wider than ops.phrase_plane.MAX_BUILD_ITEMS build their
    position plane in several <=MAX calls whose partials are OR-combined
    (the W=131072 single-call shape faults the axon TPU worker —
    exp/logs/plane_build_probe.log). Force tiny slices and pin bit-exact
    equality with the single-call plane, plus end-to-end parity."""
    import jax.numpy as jnp

    from rucene_tpu.ops import phrase_plane as pp
    from rucene_tpu.search.searcher import _PLANE_CACHE

    rng = np.random.default_rng(7)
    texts = []
    for _ in range(2200):
        words = [f"w{int(x) % 20}" for x in rng.zipf(1.3, size=int(rng.integers(6, 18)))]
        texts.append(" ".join(words))
    s = _searcher(texts)
    leaf = s.reader.leaves[0]
    rec = leaf.term_record("body", "w1")
    assert rec.block_count > 4, "corpus too small to slice"

    _PLANE_CACHE.clear()
    whole = s._phrase_plane_for(leaf, "body", "w1")
    whole = (np.asarray(whole[0]), np.asarray(whole[1]))

    _PLANE_CACHE.clear()
    monkeypatch.setattr(pp, "MAX_BUILD_ITEMS", 4)  # forces >= 2 slices
    sliced = s._phrase_plane_for(leaf, "body", "w1")
    sliced = (np.asarray(sliced[0]), np.asarray(sliced[1]))
    assert np.array_equal(whole[0], sliced[0])
    assert np.array_equal(whole[1], sliced[1])

    # end-to-end: the sliced plane serves a real phrase search exactly
    s.PHRASE_SCALAR_MAX_DOCS = 0
    s.PHRASE_ROW_DF_BUDGET = 0
    q = PhraseQuery("body", ["w1", "w0"])
    got = s.search_batch([q], k=12)[0]
    want = _host_result(s, q, 12)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )
    _PLANE_CACHE.clear()
