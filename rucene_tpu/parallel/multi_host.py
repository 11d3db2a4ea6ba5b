"""Multi-host (DCN) scaffolding on top of parallel/sharded.py.

The reference is strictly single-process; this module is the piece it has
no analog for: spanning one logical index over a multi-host TPU pod slice.

Layout rule (the "How to Scale Your Model" recipe): put the axis with the
heavy collective INSIDE a host's ICI domain and the embarrassingly-parallel
axis across hosts, because DCN is an order of magnitude slower than ICI:

- "shard" (segment shards; all_gather of per-shard top-k) -> intra-host ICI
- "dp"    (query batch; no cross-communication at all)    -> across hosts/DCN

So a 4-host x 8-chip slice runs 8 segment shards per host and 4-way query
data-parallelism, and the only DCN traffic is input/output distribution.

Usage (one process per host, standard jax.distributed bootstrap):

    from rucene_tpu.parallel import multi_host as mh
    mh.initialize(coordinator="10.0.0.1:8476", num_processes=4, process_id=i)
    mesh = mh.make_pod_mesh()          # ("shard" within host, "dp" across)
    idx = ShardedIndex(mesh, reader)   # same single-host classes
    searcher = ShardedSearcher(idx)

ShardedIndex supports two loading modes (parallel/sharded.py): full (every
process builds identical global arrays) and partial (each host loads only
its own shards' postings, global stats are psum'd across the mesh, and
cross-shard fallback queries batch into one all_gather per group —
sharded.py partial mode). Validated single-process (the degenerate 1-host
case is exactly the sharded.py path); multi-process needs a real pod.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed bootstrap (no-op when already initialized or when
    running single-process with no coordinator)."""
    if coordinator is None and num_processes in (None, 1):
        return  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(
    shards_per_host: int | None = None,
    devices=None,
    partition: str = "replicated",
) -> Mesh:
    """Mesh over ALL devices of the (possibly multi-process) runtime.

    partition="replicated" (small index, max QPS): "shard" within each
    host's ICI domain, "dp" across hosts — every host holds the whole
    index, zero DCN traffic on the hot path.

    partition="index" (big index, partial loading): "shard" ACROSS hosts —
    each host loads only its segment groups (ShardedIndex.from_directory);
    the per-query DCN traffic is the [S, B, k] top-k all_gather, which is
    tiny, so the slow-axis rule still holds (the heavy postings arrays
    never cross hosts).

    jax.devices() orders devices by process, so reshaping to
    (n_hosts, devices_per_host) puts each row on one host's ICI domain."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    procs = sorted({getattr(d, "process_index", 0) for d in devices})
    n_hosts = len(procs)
    per_host = n // n_hosts
    if partition == "index":
        # rows = hosts (optionally several shard rows per host)
        shards_per_host = shards_per_host or 1
        dp_within = per_host // shards_per_host
        if per_host % shards_per_host:
            raise ValueError(
                f"{per_host} devices/host not divisible by "
                f"shards_per_host={shards_per_host}"
            )
        grid = np.asarray(devices).reshape(n_hosts * shards_per_host, dp_within)
        return Mesh(grid, axis_names=("shard", "dp"))
    if shards_per_host is None:
        shards_per_host = per_host
    if per_host % shards_per_host:
        raise ValueError(
            f"{per_host} devices/host not divisible by shards_per_host={shards_per_host}"
        )
    dp_within = per_host // shards_per_host
    # rows: host-major (process order); within a host: shard-major
    grid = np.asarray(devices).reshape(n_hosts, shards_per_host, dp_within)
    # mesh axes ("shard", "dp"): shard within host, dp = host x intra-host dp
    grid = np.transpose(grid, (1, 0, 2)).reshape(shards_per_host, n_hosts * dp_within)
    return Mesh(grid, axis_names=("shard", "dp"))


def process_local_query_slice(n_queries: int) -> slice:
    """The contiguous slice of a globally-ordered query batch this process
    should feed (dp rides across hosts; each host feeds its own queries)."""
    pid = jax.process_index()
    n_proc = jax.process_count()
    per = (n_queries + n_proc - 1) // n_proc
    return slice(pid * per, min((pid + 1) * per, n_queries))
