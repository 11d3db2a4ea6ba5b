"""BKD multi-dim point tree: parity with a linear scan, sublinearity,
merge/file survival (reference bkd_writer.rs:313, bkd_reader.rs:68)."""

import numpy as np

import rucene_tpu as rt
from rucene_tpu.util.bkd import BKD_LEAF, bkd_range_docs, build_bkd, tree_from_leaf_ordered


def _linear(vals, docs, lo, hi):
    d = vals.shape[1]
    m = np.ones(len(docs), bool)
    for j in range(d):
        if lo is not None and lo[j] is not None:
            m &= vals[:, j] >= lo[j]
        if hi is not None and hi[j] is not None:
            m &= vals[:, j] <= hi[j]
    return np.unique(docs[m]).astype(np.int64)


def test_bkd_matches_linear_scan():
    rng = np.random.default_rng(44)
    n = 20000
    vals = rng.integers(-1000, 1000, (n, 3))
    docs = rng.permutation(n).astype(np.int32)
    tree = build_bkd(vals, docs)
    # leaf-order reconstruction matches the built tree
    t2 = tree_from_leaf_ordered(tree.vals, tree.docs)
    np.testing.assert_array_equal(t2.box_min, tree.box_min)
    np.testing.assert_array_equal(t2.leaf_start, tree.leaf_start)
    for _ in range(40):
        a = rng.integers(-1000, 1000, 3)
        b = a + rng.integers(0, 600, 3)
        lo = tuple(int(x) if rng.random() > 0.2 else None for x in a)
        hi = tuple(int(x) if rng.random() > 0.2 else None for x in b)
        got = bkd_range_docs(tree, lo, hi)
        want = _linear(vals, docs, lo, hi)
        np.testing.assert_array_equal(got, want)


def test_bkd_prunes_leaves():
    """A selective box must touch far fewer points than the corpus."""
    rng = np.random.default_rng(9)
    n = 100000
    vals = rng.integers(0, 10**6, (n, 2))
    docs = np.arange(n, dtype=np.int32)
    tree = build_bkd(vals, docs)
    lo, hi = (1000, 1000), (3000, 3000)
    lo_a = np.asarray(lo)
    hi_a = np.asarray(hi)
    overlaps = ((tree.box_max >= lo_a) & (tree.box_min <= hi_a)).all(axis=1)
    touched = int(
        sum(
            tree.leaf_start[i + 1] - tree.leaf_start[i]
            for i in np.flatnonzero(overlaps)
        )
    )
    assert touched < n // 10  # sublinear: <10% of points touched
    got = bkd_range_docs(tree, lo, hi)
    np.testing.assert_array_equal(got, _linear(vals, docs, lo, hi))


def test_multidim_point_query_end_to_end(tmp_path):
    from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
    from rucene_tpu.store.directory import FSDirectory

    rng = np.random.default_rng(4)
    pts = rng.integers(0, 100, (800, 2))
    w = IndexWriter(FSDirectory(tmp_path), IndexWriterConfig())
    for i, (x, y) in enumerate(pts):
        d = rt.Document()
        d.add(rt.TextField("body", f"doc{i}"))
        d.add(rt.IntPoint("loc", int(x), int(y)))
        w.add_document(d)
    w.commit()
    s = rt.IndexSearcher(w.get_reader())
    q = rt.PointRangeQuery("loc", (10, 20), (40, 60))
    td = s.search(q, k=1000)
    want = {
        i
        for i, (x, y) in enumerate(pts)
        if 10 <= x <= 40 and 20 <= y <= 60
    }
    assert {sd.doc for sd in td.score_docs} == want
    assert td.total_hits == len(want)
    # survives a force_merge (BKD rebuilt over remapped docs)
    w.force_merge(1)
    s2 = rt.IndexSearcher(w.get_reader())
    td2 = s2.search(q, k=1000)
    assert td2.total_hits == len(want)
    w.close()
