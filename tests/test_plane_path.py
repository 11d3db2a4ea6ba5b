"""Dense tf-plane boolean path (executor.execute_planes): differential
parity vs the lane paths across the plain boolean algebra — SHOULD / MUST
/ FILTER / MUST_NOT mixes, min_should_match, duplicated and missing terms,
deletes, multi-segment, multi-field — plus an independent-oracle check.

reference: the skip-list leapfrog these planes replace for high-df terms
lives in rucene src/core/search/scorer/conjunction_scorer.rs and
disjunction_scorer.rs:24.
"""

import os

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.searcher import IndexSearcher
from rucene_tpu.util.metrics import METRICS


@pytest.fixture(autouse=True)
def _force_planes():
    os.environ["RUCENE_PLANES"] = "1"  # plane every term (mdp tiny here)
    # tf planes build from the decoded residency; small (floored)
    # segments serve packed under auto since r5, so force decoded here
    os.environ["RUCENE_DECODED"] = "1"
    yield
    os.environ.pop("RUCENE_PLANES", None)
    os.environ.pop("RUCENE_DECODED", None)


def _zipf(v):
    p = 1.0 / np.arange(1, v + 1)
    return p / p.sum()


def _texts(n_docs, vocab, seed):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    out = []
    for _ in range(n_docs):
        n = int(rng.integers(3, 9))
        toks = rng.choice(vocab, size=n, p=_zipf(vocab))
        out.append(" ".join(words[t] for t in toks))
    return out, words


def _index(n_docs=2500, vocab=50, seed=5, n_segments=1, extra_field=False):
    texts, words = _texts(n_docs, vocab, seed)
    snaps = []
    per = n_docs // n_segments
    for s in range(n_segments):
        buf = SegmentBuffer()
        for t in texts[s * per : (s + 1) * per]:
            d = rt.Document()
            d.add(rt.TextField("body", t))
            if extra_field:
                d.add(rt.TextField("title", t.split()[0]))
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"s{s}", pack_segment(buf.finish())))
    return IndexReader(snaps), words, texts


def _bool(pairs, msm=0):
    q = rt.BooleanQuery()
    for kind, term in pairs:
        getattr(q, kind)(rt.TermQuery(rt.Term(*term)))
    if msm:
        q.min_should_match = msm
    return q


def _queries(words, rng, n=40, field="body"):
    qs = []
    kinds = ["should", "must", "filter", "must_not"]
    for i in range(n):
        t = lambda: ("body", words[int(rng.integers(0, len(words)))])
        if i % 5 == 0:
            qs.append(_bool([("should", t()), ("should", t())]))
        elif i % 5 == 1:
            qs.append(_bool([("must", t()), ("must", t())]))
        elif i % 5 == 2:
            qs.append(_bool([("must", t()), ("should", t()), ("should", t())]))
        elif i % 5 == 3:
            qs.append(_bool([("must", t()), ("must_not", t())]))
        else:
            qs.append(_bool([("must", t()), ("filter", t())]))
    # explicit min_should_match over 3 SHOULDs
    t = lambda: ("body", words[int(rng.integers(0, len(words)))])
    qs.append(_bool([("should", t()), ("should", t()), ("should", t())], msm=2))
    # duplicated term, missing terms
    qs.append(_bool([("must", ("body", "w1")), ("must", ("body", "w1"))]))
    qs.append(_bool([("must", ("body", "w1")), ("must", ("body", "zz_miss"))]))
    qs.append(_bool([("should", ("body", "w1")), ("should", ("body", "zz_miss"))]))
    return qs


def _run_both(reader, qs, k, expect_rows=None):
    METRICS.reset()
    got = IndexSearcher(reader).search_batch(qs, k=k)
    routed = METRICS.snapshot()["counters"].get("route.plane_rows", 0)
    assert routed >= (len(qs) if expect_rows is None else expect_rows), (
        f"plane path did not engage ({routed})"
    )
    os.environ["RUCENE_PLANES"] = "0"
    try:
        # fresh reader: the planes-on device segment is cached on the old one
        ref_reader = IndexReader(list(reader.leaves))
        ref = IndexSearcher(ref_reader).search_batch(qs, k=k)
    finally:
        os.environ["RUCENE_PLANES"] = "1"
    return got, ref


def _assert_equal(got, ref):
    from tests.hitcheck import assert_hits_equal

    for g, r in zip(got, ref):
        assert g.total_hits == r.total_hits
        # the engine's parity contract (hitcheck): near-ties within the
        # ~1-ULP XLA drift may reorder between two device paths — exact
        # doc-order equality only holds outside the tie tolerance
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in r.score_docs],
        )


@pytest.mark.parametrize("k", [3, 64])
def test_plane_parity_algebra(k):
    reader, words, _ = _index()
    qs = _queries(words, np.random.default_rng(21))
    got, ref = _run_both(reader, qs, k)
    _assert_equal(got, ref)


def test_plane_parity_multi_segment():
    reader, words, _ = _index(n_segments=3)
    qs = _queries(words, np.random.default_rng(22))
    got, ref = _run_both(reader, qs, 10)
    _assert_equal(got, ref)


def test_plane_parity_with_deletes():
    reader, words, _ = _index()
    live = np.ones(reader.leaves[0].max_doc, bool)
    live[::4] = False
    reader2 = IndexReader([reader.leaves[0].with_deletes(live)])
    qs = _queries(words, np.random.default_rng(23))
    got, ref = _run_both(reader2, qs, 10)
    _assert_equal(got, ref)


def test_plane_single_term_rows():
    """RUCENE_PLANE_TERMS=1 routes single-term rows through planes too."""
    reader, words, _ = _index()
    qs = [rt.TermQuery(rt.Term("body", words[i % 30])) for i in range(16)]
    os.environ["RUCENE_PLANE_TERMS"] = "1"
    try:
        got, ref = _run_both(reader, qs, 10)
    finally:
        os.environ.pop("RUCENE_PLANE_TERMS", None)
    _assert_equal(got, ref)


def test_plane_multi_field_rows():
    """Clauses across two norms rows exercise the per-slot cval gather
    (same_fid == -1)."""
    reader, words, _ = _index(extra_field=True)
    rng = np.random.default_rng(24)
    qs = []
    for _ in range(12):
        t1 = words[int(rng.integers(0, 30))]
        t2 = words[int(rng.integers(0, 30))]
        qs.append(_bool([("should", ("body", t1)), ("should", ("title", t2))]))
    got, ref = _run_both(reader, qs, 10)
    _assert_equal(got, ref)


def test_plane_oracle_spot_check():
    """Independent numpy oracle on a few rows (not just path-vs-path)."""
    from tests.hitcheck import assert_hits_equal
    from tests.oracle import OracleIndex

    reader, words, texts = _index(n_docs=800, vocab=30, seed=9)
    orc = OracleIndex(texts)
    s = IndexSearcher(reader)
    for must, should, must_not in [
        (["w1", "w2"], [], []),
        ([], ["w0", "w3"], []),
        (["w2"], ["w5"], ["w7"]),
    ]:
        q = rt.BooleanQuery()
        for t in must:
            q.must(rt.TermQuery(rt.Term("body", t)))
        for t in should:
            q.should(rt.TermQuery(rt.Term("body", t)))
        for t in must_not:
            q.must_not(rt.TermQuery(rt.Term("body", t)))
        METRICS.reset()
        td = s.search(q, k=20)
        assert METRICS.snapshot()["counters"].get("route.plane_rows", 0) >= 1
        want, want_hits = orc.search_bool(must, should, must_not, 20)
        assert td.total_hits == want_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in td.score_docs], want
        )


def test_plane_policy_auto_gate():
    from rucene_tpu.codec.device import plane_policy

    os.environ.pop("RUCENE_PLANES", None)
    budget, df_min = plane_policy(1 << 20)
    assert budget > 0 and df_min == (1 << 20) // 512
    assert plane_policy(1 << 16)[0] == 0  # small segments: planes off
    os.environ["RUCENE_PLANES"] = "0"
    assert plane_policy(1 << 20)[0] == 0
