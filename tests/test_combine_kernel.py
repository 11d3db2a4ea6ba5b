"""Hist-matmul combine kernel vs scatter oracle.

reference analog: the dense accumulation the executor's scatter branch
performs (executor.py step 3) — same sums, MXU-shaped.
"""

import numpy as np
import pytest

from rucene_tpu.ops.combine_tables import build_combine_tables
from rucene_tpu.ops.pallas_combine import (
    combine_lanes_pallas,
    combine_lanes_reference,
)


def _synthetic(w=40, b=8, md=4096, seed=0, dense_frac=0.7):
    """Synthetic decoded work items: blocks of 128 ascending docs."""
    rng = np.random.default_rng(seed)
    docs = np.full((w, 128), md + 1, np.int32)
    sc = np.zeros((w, 128), np.float32)
    rows = rng.integers(0, b, w).astype(np.int32)
    encs = rng.choice([1, 256, 65536], w).astype(np.int32)
    valid = np.ones(w, bool)
    valid[-2:] = False  # padding items
    blk_first = np.zeros(w, np.int64)
    blk_last = np.zeros(w, np.int64)
    for i in range(w):
        if rng.random() < dense_frac:
            start = int(rng.integers(0, md - 400))
            d = start + np.sort(rng.choice(400, 128, replace=False))
        else:  # sparse item spanning most of the doc space
            d = np.sort(rng.choice(md, 128, replace=False))
        n = int(rng.integers(40, 129))  # tail blocks have fewer lanes
        docs[i, :n] = d[:n]
        sc[i, :n] = rng.random(n).astype(np.float32) * 3.0
        blk_first[i] = d[0]
        blk_last[i] = d[n - 1]
    return docs, sc, rows, encs, valid, blk_first, blk_last


def test_combine_tables_cover_all_lanes():
    md = 4096
    docs, sc, rows, encs, valid, bf, bl = _synthetic(md=md)
    w = len(rows)
    tbl = build_combine_tables(
        np.arange(w, dtype=np.int32), rows, encs, valid, w, bf, bl, md,
        c_bucket=512,
    )
    # every valid lane of a non-residue item is covered by exactly one entry
    residue = set(tbl.residue_items.tolist())
    covered = np.zeros((w, 128), np.int32)
    g = len(tbl.e_item) // tbl.n_steps
    for t in range(tbl.n_steps):
        bucket = tbl.g_bucket[t]
        for j in range(g):
            it = tbl.e_item[t * g + j]
            if it < 0:
                continue
            d = docs[it]
            inb = (d >= bucket * 512) & (d < (bucket + 1) * 512)
            covered[it] += inb
    for i in range(w):
        if not valid[i] or i in residue:
            continue
        lanes = docs[i] <= md
        assert (covered[i][lanes] == 1).all(), f"item {i} lanes not covered once"
        assert (covered[i][~lanes] == 0).all()


@pytest.mark.parametrize("c_bucket", [512, 1024])
def test_combine_kernel_matches_scatter(c_bucket):
    md = 4096
    docs, sc, rows, encs, valid, bf, bl = _synthetic(md=md)
    w = len(rows)
    b = 8
    tbl = build_combine_tables(
        np.arange(w, dtype=np.int32), rows, encs, valid, w, bf, bl, md,
        c_bucket=c_bucket,
    )
    safe = np.clip(tbl.e_item, 0, w - 1)
    live = tbl.e_item >= 0
    docs_e = np.where(live[:, None], docs[safe], md + 1).astype(np.int32)
    sc_e = np.where(live[:, None], sc[safe], 0.0).astype(np.float32)

    acc_s, acc_c = combine_lanes_pallas(
        tbl.g_bucket, tbl.g_first, docs_e, sc_e,
        tbl.e_row, tbl.e_enc.astype(np.float32),
        n_buckets=tbl.n_buckets, c_bucket=c_bucket, interpret=True,
    )
    acc_s = np.asarray(acc_s)[:b, :md].astype(np.float64)
    acc_c = np.asarray(acc_c)[:b, :md]
    # residue items fold in via plain scatter (the hybrid the executor uses)
    for it in tbl.residue_items:
        for l2 in range(128):
            d = docs[it, l2]
            if 0 <= d < md:
                acc_s[rows[it], d] += sc[it, l2]
                acc_c[rows[it], d] += encs[it]

    want_s, want_c = combine_lanes_reference(docs, sc, rows, encs, valid, b, md)
    assert np.array_equal(acc_c.astype(np.int64), want_c), "counts differ"
    err = np.abs(acc_s - want_s)
    tol = 4e-7 * np.maximum(1.0, np.abs(want_s))
    assert (err <= tol).all(), f"max err {err.max()}"


def test_combine_batch_gating():
    """Engagement rules are measurement-derived — pin them."""
    import os

    import numpy as np

    from rucene_tpu.search.searcher import build_combine_batch

    w = 32768
    arrays = (
        np.zeros(w, np.int32), np.zeros(w, np.int32), np.zeros(w, np.float32),
        np.zeros(w, np.int32), np.full(w, 256, np.int32), np.ones(w, bool),
    )
    bf = np.zeros(1, np.int64)
    bl = np.full(1, 100, np.int64)
    os.environ["RUCENE_COMBINE_INTERPRET"] = "1"
    try:
        # 32 rows on a 1M-doc space: engaged
        assert build_combine_batch(arrays, 32, bf, bl, 1 << 20, enabled=False) is not None
        # 256 rows: off (chunked calls lose to scatter)
        assert build_combine_batch(arrays, 256, bf, bl, 1 << 20, enabled=False) is None
        # small doc space: off
        assert build_combine_batch(arrays, 32, bf, bl, 50176, enabled=False) is None
        # candidate-strategy shapes (b*md > 12*l): off
        small = tuple(a[:512] for a in arrays)
        assert build_combine_batch(small, 32, bf, bl, 1 << 20, enabled=False) is None
    finally:
        del os.environ["RUCENE_COMBINE_INTERPRET"]
    # kill switch
    os.environ["RUCENE_NO_COMBINE"] = "1"
    try:
        assert build_combine_batch(arrays, 32, bf, bl, 1 << 20, enabled=True) is None
    finally:
        del os.environ["RUCENE_NO_COMBINE"]
