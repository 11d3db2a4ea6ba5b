"""Multi-device search: segment shards on a mesh + ICI top-k merge.

The reference is single-process; its nearest analogs are leaf-sliced
thread-pool search with channel-merged collectors
(rucene src/core/search/searcher.rs:419-470,527-630 and
collector/top_docs.rs:120+). Here:

- mesh axes ("shard", "dp"): segments shard over "shard", the query batch
  shards over "dp";
- every device runs the SAME executor program on its local (segment slice,
  query slice) — postings stay resident in each device's HBM;
- per-shard top-k results are merged with one all_gather over the shard
  axis (k entries per shard, tiny) + a replicated 2k*S sort — the
  distributed TopDocs merge rides ICI, never the host;
- total hit counts reduce with psum.

Shards must share array shapes to stack; ShardedIndex pads all segments to
the max bucket (build_device_segment min_* floors).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rucene_tpu.codec.device import DeviceSegment, build_device_segment
from rucene_tpu.index.reader import IndexReader
from rucene_tpu.search.executor import FlatQueryBatch, execute_flat_impl
from rucene_tpu.search.query import Query
from rucene_tpu.search.searcher import (
    ScoreDoc,
    TopDocs,
    build_clause_tables,
    build_flat_work,
    build_leaf_cache,
    build_leaf_tables,
)
from rucene_tpu.search.similarity import BM25Similarity
from rucene_tpu.util import next_pow2

_DOC_PAD = np.int32(2**31 - 1)


def make_mesh(n_shards: int, n_dp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if len(devices) < n_shards * n_dp:
        raise ValueError(f"need {n_shards * n_dp} devices, have {len(devices)}")
    grid = devices[: n_shards * n_dp].reshape(n_shards, n_dp)
    return Mesh(grid, axis_names=("shard", "dp"))


class ShardedIndex:
    """S equal-shape segment shards stacked on a leading axis and placed
    shard-per-device. Empty filler shards pad the count up to S."""

    def __init__(self, mesh: Mesh, reader: IndexReader):
        self.mesh = mesh
        self.reader = reader
        s = mesh.shape["shard"]
        leaves = list(reader.leaves)
        if len(leaves) > s:
            raise ValueError(
                f"{len(leaves)} segments > {s} shards; force_merge the index "
                f"down to at most {s} segments first"
            )
        if not leaves:
            raise ValueError("cannot shard an empty reader")
        self.leaves = leaves
        self.n_shards = s

        # common padded shapes across shards
        min_blocks = max((lf.packed.num_blocks for lf in leaves), default=1)
        min_words = max((len(lf.packed.data) for lf in leaves), default=2)
        min_md = max((lf.max_doc for lf in leaves), default=1)
        min_pos = max((len(lf.packed.positions) for lf in leaves), default=1)
        min_fields = max(
            (max((pf.field_id for pf in lf.packed.fields.values()), default=0) + 1 for lf in leaves),
            default=1,
        )

        host_segments = []
        doc_base = []
        for lf in leaves:
            host_segments.append(
                build_device_segment(
                    lf.packed,
                    live=lf.live,
                    min_blocks=min_blocks,
                    min_words=min_words,
                    min_max_doc=min_md,
                    min_positions=min_pos,
                    min_fields=min_fields,
                    as_numpy=True,
                )
            )
            doc_base.append(lf.doc_base)
        # filler shards: same shapes, zero live docs
        while len(host_segments) < s:
            host_segments.append(DeviceSegment(*[np.zeros_like(a) for a in host_segments[0]]))
            doc_base.append(0)

        stacked_host = DeviceSegment(
            *[np.stack([getattr(seg, f) for seg in host_segments]) for f in DeviceSegment._fields]
        )
        shard_spec = NamedSharding(mesh, P("shard"))
        self.stacked = DeviceSegment(
            *[jax.device_put(leaf, shard_spec) for leaf in stacked_host]
        )
        self.doc_base = jax.device_put(np.asarray(doc_base, dtype=np.int32), shard_spec)


@partial(jax.jit, static_argnames=("k", "mesh", "use_pallas", "pure"))
def _sharded_search_step(
    mesh, stacked, fq, doc_base, k: int, use_pallas: bool = False, pure: bool = False
):
    """One fused device program: per-(shard,dp) flat execute + ICI
    all-gather merge over the shard axis."""

    def local(dev_s, fq_s, base_s):
        dev = jax.tree.map(lambda a: a[0], dev_s)
        q = jax.tree.map(lambda a: a[0, 0], fq_s)
        scores, docs, hits = execute_flat_impl(
            dev, q, k, use_pallas=use_pallas, pure_disjunction=pure
        )
        gdocs = jnp.where(scores > -jnp.inf, docs + base_s[0], jnp.int32(_DOC_PAD))
        sg = jax.lax.all_gather(scores, "shard")  # [S, B', k]
        dg = jax.lax.all_gather(gdocs, "shard")
        hg = jax.lax.psum(hits, "shard")
        b = scores.shape[0]
        sflat = jnp.swapaxes(sg, 0, 1).reshape(b, -1)
        dflat = jnp.swapaxes(dg, 0, 1).reshape(b, -1)
        _, dsort, ssort = jax.lax.sort((-sflat, dflat, sflat), num_keys=2, dimension=-1)
        return ssort[:, :k], dsort[:, :k], hg

    fq_specs = FlatQueryBatch(
        wi_block=P("shard", "dp"),
        wi_row=P("shard", "dp"),
        wi_weight=P("shard", "dp"),
        wi_fid=P("shard", "dp"),
        wi_enc=P("shard", "dp"),
        wi_valid=P("shard", "dp"),
        n_required=P("shard", "dp"),
        min_should=P("shard", "dp"),
        cache=P("shard", "dp"),
    )
    dev_specs = jax.tree.map(lambda _: P("shard"), stacked)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(dev_specs, fq_specs, P("shard")),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    return fn(stacked, fq, doc_base)


class ShardedSearcher:
    """Batch searcher over a ShardedIndex: one fused multi-device dispatch
    per batch (the v5e-8 fan-out + ICI top-k merge configuration from
    BASELINE.json)."""

    def __init__(self, index: ShardedIndex, similarity: BM25Similarity | None = None):
        self.index = index
        self.reader = index.reader
        self.similarity = similarity or BM25Similarity()
        self._stats = {}

    def collection_stats(self, field: str):
        st = self._stats.get(field)
        if st is None:
            st = self.reader.collection_stats(field)
            self._stats[field] = st
        return st

    def search_batch(self, queries: list[Query], k: int = 10) -> list[TopDocs]:
        mesh = self.index.mesh
        s = self.index.n_shards
        dp = mesh.shape["dp"]
        rqs = [None if hasattr(q, "host_eval") else q.rewrite() for q in queries]
        # phrases/ranges/groups/match-all and host_eval queries fall back to
        # the per-leaf searcher (single-process path) for now
        fallback_idx = [
            i
            for i, rq in enumerate(rqs)
            if rq is None or rq.phrases or rq.ranges or rq.groups or rq.match_all
        ]
        if fallback_idx:
            from rucene_tpu.search.searcher import IndexSearcher

            local = IndexSearcher(self.reader, self.similarity)
            fb_results = {
                i: local.search_batch([queries[i]], k=k)[0] for i in fallback_idx
            }
            keep = [i for i in range(len(queries)) if i not in fb_results]
            if not keep:
                return [fb_results[i] for i in range(len(queries))]
            sub = self.search_batch([queries[i] for i in keep], k=k)
            out = []
            it = iter(sub)
            for i in range(len(queries)):
                out.append(fb_results[i] if i in fb_results else next(it))
            return out
        rqs = [q.rewrite() for q in queries]
        sim = self.similarity

        doc_freqs = {}
        fields = set()
        for rq in rqs:
            for c in rq.clauses:
                fields.add(c.term.field)
                key = (c.term.field, c.term.text)
                if key not in doc_freqs:
                    doc_freqs[key] = self.reader.doc_freq(*key)
        stats = {f: self.collection_stats(f) for f in fields}

        b_actual = len(rqs)
        b_pad = max(next_pow2(b_actual, 1), dp)
        b_local = b_pad // dp
        t_pad = next_pow2(max((len(rq.clauses) for rq in rqs), default=1), 1)
        weight, occur, n_required, min_should, _, _ = build_clause_tables(
            rqs, sim, doc_freqs, stats, b_pad, t_pad
        )

        # per-(shard, dp) flat work lists over each cell's local query rows
        n_fields = self.index.stacked.norms.shape[1]
        cells = []  # [S][DP] dict of work arrays
        w_req = 1
        for si in range(s):
            row = []
            for di in range(dp):
                lo, hi = di * b_local, (di + 1) * b_local
                if si < len(self.index.leaves):
                    leaf = self.index.leaves[si]
                    bs, bc, fid = build_leaf_tables(leaf, rqs, b_pad, t_pad)
                    cache = build_leaf_cache(leaf, sim, stats, n_fields=n_fields)
                else:
                    bs = np.zeros((b_pad, t_pad), np.int32)
                    bc = np.zeros((b_pad, t_pad), np.int32)
                    fid = np.zeros((b_pad, t_pad), np.int32)
                    cache = np.full((n_fields, 256), float(sim.k1), np.float32)
                n_items = int(bc[lo:hi].sum())
                w_req = max(w_req, n_items)
                row.append((bs[lo:hi], bc[lo:hi], weight[lo:hi], fid[lo:hi], occur[lo:hi], cache))
            cells.append(row)
        w_pad = next_pow2(w_req, 1)

        def build_cell(args):
            bs, bc, wt, fid, occ, cache = args
            wi = build_flat_work(bs, bc, wt, fid, occ, w_pad=w_pad)
            return wi[:6] + (cache,)

        stackf = lambda idx: np.stack(
            [np.stack([build_cell(cells[si][di])[idx] for di in range(dp)]) for si in range(s)]
        )
        fq = FlatQueryBatch(
            wi_block=stackf(0),
            wi_row=stackf(1),
            wi_weight=stackf(2),
            wi_fid=stackf(3),
            wi_enc=stackf(4),
            wi_valid=stackf(5),
            n_required=np.broadcast_to(
                n_required.reshape(dp, b_local), (s, dp, b_local)
            ).copy(),
            min_should=np.broadcast_to(
                min_should.reshape(dp, b_local), (s, dp, b_local)
            ).copy(),
            cache=stackf(6),
        )
        fq = jax.device_put(fq)
        use_pallas = mesh.devices.flat[0].platform not in ("cpu",)
        from rucene_tpu.search.query import Occur

        pure = all(
            rq.n_required == 0
            and rq.effective_min_should() <= 1
            and rq.clauses
            and all(c.occur == Occur.SHOULD for c in rq.clauses)
            and all(weight[i, j] > 0 for j in range(len(rq.clauses)))
            for i, rq in enumerate(rqs)
        )
        scores, docs, hits = _sharded_search_step(
            mesh, self.index.stacked, fq, self.index.doc_base, k, use_pallas, pure
        )
        scores = np.asarray(scores)
        docs = np.asarray(docs)
        hits = np.asarray(hits)
        out = []
        for i in range(b_actual):
            keep = scores[i] > -np.inf
            out.append(
                TopDocs(
                    total_hits=int(hits[i]),
                    score_docs=[
                        ScoreDoc(int(d), float(sc))
                        for d, sc in zip(docs[i][keep], scores[i][keep])
                    ],
                )
            )
        return out
