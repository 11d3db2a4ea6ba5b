"""Tolerant hit-list comparison.

XLA's f32 division is not correctly rounded (TPU has no divider; CPU backend
uses a fast path), so engine scores can differ from a numpy oracle by ~1 ULP.
Parity contract: same doc set, scores within `rtol`, and ordering identical
except where two hits' scores are within tolerance of each other.
"""

from __future__ import annotations


RTOL = 4e-7  # a few ULPs of f32


def assert_hits_equal(got: list[tuple[int, float]], want: list[tuple[int, float]], rtol=RTOL):
    assert len(got) == len(want), f"hit count {len(got)} != {len(want)}"
    if not got:
        return
    gd = {d: s for d, s in got}
    wd = {d: s for d, s in want}
    diff = set(gd) ^ set(wd)
    if diff:
        # truncated lists may legitimately admit different docs at the
        # k-th boundary when two execution paths' scores differ by ~1 ULP
        # (e.g. per-leaf vs combined after a shape-bucket change): every
        # disputed doc must score within tolerance of the cutoff
        cutoff = min(got[-1][1], want[-1][1])
        for d in diff:
            s = gd.get(d, wd.get(d))
            assert abs(s - cutoff) <= rtol * max(1.0, abs(cutoff)), (
                f"doc sets differ beyond the boundary tolerance: {diff}, "
                f"doc {d} score {s} vs cutoff {cutoff}"
            )
    for d in gd:
        if d not in wd:
            continue
        assert abs(gd[d] - wd[d]) <= rtol * max(1.0, abs(wd[d])), (d, gd[d], wd[d])
    # order must match except where adjacent want-scores are within tolerance
    for i, ((g_doc, g_s), (w_doc, w_s)) in enumerate(zip(got, want)):
        if g_doc != w_doc:
            assert abs(g_s - w_s) <= rtol * max(1.0, abs(w_s)), (
                f"position {i}: doc {g_doc}({g_s}) vs {w_doc}({w_s}) beyond tie tolerance"
            )
