"""Range-filter planes, synonym device path, and probe dispatch.

Mixed into IndexSearcher (searcher.py). Three self-contained device
paths that share nothing with the main routed executor flow:

- range/exists filter planes: constant-score doc-set filters as cached
  device bool[mdp] planes (reference point_range_query.rs constant-score
  weight + the query cache it would ride, query_cache.rs:229);
- the synonym path: SpanOrQuery over plain term children scored as ONE
  BM25 application over summed tfs (span_or.rs + SpanScorer width-1);
- execute_probe dispatch for the rescorer's second pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rucene_tpu.search.flat_tables import (
    build_clause_tables,
    build_flat_work,
    build_leaf_cache,
    build_leaf_tables,
    build_range_filter_tables,
    make_flat_batch,
)
from rucene_tpu.search.query import Occur
from rucene_tpu.util import next_pow2


class FilterPathMixin:
    # --- range filters on device ---
    def _range_filter_tables(self, rqs, b_pad: int):
        return build_range_filter_tables(rqs, b_pad)

    def _leaf_plane(self, leaf, rcl):
        """Device bool[mdp] plane for one range/exists filter clause on
        one leaf; cached across batches (VERDICT: the device executor must
        not recompute identical filter work every batch)."""
        from rucene_tpu.search.cache import DEFAULT_QUERY_CACHE, DEVICE_PLANE_CACHE

        mdp = int(leaf.device.live.shape[0])

        def compute():
            docs = DEFAULT_QUERY_CACHE.get_or_compute(
                leaf, rcl.cache_key, lambda: rcl.doc_set(leaf)
            )
            m = np.zeros(mdp, bool)
            m[np.asarray(docs, np.int64)] = True
            return jax.device_put(m)

        return DEVICE_PLANE_CACHE.get_or_compute(
            leaf, ("plane",) + rcl.cache_key, compute
        )

    def _leaf_filters(self, leaf, keys, idx, enc, boost):
        from rucene_tpu.search.cache import DEVICE_PLANE_CACHE
        from rucene_tpu.search.executor import FilterPlanes

        p_pad = next_pow2(max(len(keys), 1), 1)
        mdp = int(leaf.device.live.shape[0])

        def stack():
            planes = [self._leaf_plane(leaf, k2) for k2 in keys]
            while len(planes) < p_pad:
                planes.append(jnp.zeros(mdp, bool))
            return jnp.stack(planes)

        st = DEVICE_PLANE_CACHE.get_or_compute(
            leaf, ("stack", tuple(r.cache_key for r in keys)), stack
        )
        return FilterPlanes(
            planes=st, idx=jnp.asarray(idx), enc=jnp.asarray(enc),
            boost=jnp.asarray(boost),
        )

    def _view_filters(self, view, leaves, keys, idx, enc, boost):
        """FilterPlanes in a combined view's padded doc space: each leaf's
        doc set lands at its view doc base."""
        from rucene_tpu.search.cache import DEFAULT_QUERY_CACHE, DEVICE_PLANE_CACHE
        from rucene_tpu.search.executor import FilterPlanes

        p_pad = next_pow2(max(len(keys), 1), 1)
        mdp = int(view.device.live.shape[0])
        # view.uid is monotonic and survives live-plane swaps; id() of a
        # freed tensor can recycle and serve a stale plane (ADVICE r1 low)
        holder = ("view_uid", view.uid)

        def plane_of(rcl):
            def compute():
                m = np.zeros(mdp, bool)
                for li, leaf in enumerate(leaves):
                    docs = DEFAULT_QUERY_CACHE.get_or_compute(
                        leaf, rcl.cache_key, lambda leaf=leaf: rcl.doc_set(leaf)
                    )
                    m[int(view.doc_bases[li]) + np.asarray(docs, np.int64)] = True
                return jax.device_put(m)

            return DEVICE_PLANE_CACHE.get_or_compute_keyed(
                (holder, "plane", rcl.cache_key), compute
            )

        def stack():
            planes = [plane_of(k2) for k2 in keys]
            while len(planes) < p_pad:
                planes.append(jnp.zeros(mdp, bool))
            return jnp.stack(planes)

        st = DEVICE_PLANE_CACHE.get_or_compute_keyed(
            (holder, "stack", tuple(r.cache_key for r in keys)), stack
        )
        return FilterPlanes(
            planes=st, idx=jnp.asarray(idx), enc=jnp.asarray(enc),
            boost=jnp.asarray(boost),
        )

    @staticmethod
    def _ranges_complete(rqs) -> bool:
        """Candidate-path completeness with filter planes: every possible
        match must carry >= 1 decoded term lane, i.e. every range-bearing
        row has a required TERM clause. Otherwise a doc matching only the
        range would never appear among the candidates -> dense strategy."""
        return all(
            (not rq.ranges)
            or any(c.occur in (Occur.MUST, Occur.FILTER) for c in rq.clauses)
            for rq in rqs
        )

    # --- synonym device path ---
    def _search_synonym_device(self, queries, k: int):
        """SpanOrQuery over plain term children: freq(doc) = sum of member
        tfs, ONE BM25 application with the summed-idf weight
        (span_or.rs + SpanScorer width-1 spans). One executor dispatch per
        leaf for the whole batch (executor.execute_synonym)."""
        from rucene_tpu.search.executor import execute_synonym
        from rucene_tpu.search.searcher import work_has_ef

        sim = self.similarity
        infos = [q.synonym_terms() for q in queries]
        b_actual = len(infos)
        b_pad = next_pow2(b_actual, 1)
        t_pad = next_pow2(max(len(ts) for _f, ts, _b in infos), 1)

        doc_freqs: dict[tuple[str, str], int] = {}
        fields = set()
        for field, texts, _b in infos:
            fields.add(field)
            for t in texts:
                if (field, t) not in doc_freqs:
                    doc_freqs[(field, t)] = self.reader.doc_freq(field, t)
        stats = {f: self.collection_stats(f) for f in fields}

        w_row = np.zeros(b_pad, np.float32)
        for i, (field, texts, boost) in enumerate(infos):
            st = stats[field]
            doc_count = st.doc_count if st.doc_count != -1 else st.max_doc
            idf_sum = np.float32(0.0)
            for t in texts:
                idf_sum = np.float32(
                    idf_sum + sim.idf(doc_freqs[(field, t)], doc_count)
                )
            w = np.float32(idf_sum * np.float32(boost))
            w_row[i] = np.float32(w * np.float32(sim.k1 + np.float32(1.0)))

        n_required = np.zeros(b_pad, np.int32)
        min_should = np.ones(b_pad, np.int32)
        weight = np.ones((b_pad, t_pad), np.float32)
        occur = np.zeros((b_pad, t_pad), np.int32)  # SHOULD

        per_query_leaf: list[list] = [[] for _ in range(b_actual)]
        for leaf in self.reader.leaves:
            cache = build_leaf_cache(leaf, sim, stats)
            block_start = np.zeros((b_pad, t_pad), np.int32)
            block_count = np.zeros((b_pad, t_pad), np.int32)
            field_id = np.zeros((b_pad, t_pad), np.int32)
            fid_row = np.zeros(b_pad, np.int32)
            for i, (field, texts, _b) in enumerate(infos):
                pf = leaf.packed.fields.get(field)
                if pf is not None:
                    fid_row[i] = pf.field_id
                for j, t in enumerate(texts):
                    rec = leaf.term_record(field, t)
                    if rec is not None:
                        block_start[i, j] = rec.block_start
                        block_count[i, j] = rec.block_count
                        field_id[i, j] = pf.field_id if pf is not None else 0
            work = build_flat_work(block_start, block_count, weight, field_id, occur)
            fq = make_flat_batch(work, n_required, min_should, cache, dev=leaf.device)
            s, d, h = jax.device_get(
                execute_synonym(
                    leaf.device, fq, jnp.asarray(fid_row), jnp.asarray(w_row),
                    k=k, use_pallas=self._use_pallas,
                    has_ef=work_has_ef(leaf.packed.blk_doc_bits, work[0], work[5], dev=leaf.device),
                )
            )
            for i in range(b_actual):
                per_query_leaf[i].append((leaf.doc_base, d[i], s[i], int(h[i])))
        return [self._merge_leaf_hits(per_query_leaf[i], k) for i in range(b_actual)]

    def _probe_device(self, rq, leaf, locs, stats, doc_freqs):
        """(match, score) of one rewritten query at specific local docs on
        one leaf — a single dense executor dispatch + gather
        (executor.execute_probe); serves the rescorer's second pass."""
        from rucene_tpu.search.executor import execute_probe
        from rucene_tpu.search.searcher import work_has_ef

        sim = self.similarity
        b_pad = 1
        t_pad = next_pow2(max(len(rq.clauses), 1), 1)
        weight, occur, n_required, min_should, _, _ = build_clause_tables(
            [rq], sim, doc_freqs, stats, b_pad, t_pad
        )
        cache = build_leaf_cache(leaf, sim, stats)
        bs, bc, fid = build_leaf_tables(leaf, [rq], b_pad, t_pad)
        work = build_flat_work(bs, bc, weight, fid, occur)
        filters = (
            self._leaf_filters(leaf, *self._range_filter_tables([rq], b_pad))
            if rq.ranges
            else None
        )
        fq = make_flat_batch(work, n_required, min_should, cache, dev=leaf.device)
        p_pad = next_pow2(max(len(locs), 1), 1)
        probe = np.full(p_pad, -1, np.int32)
        probe[: len(locs)] = np.asarray(locs, np.int32)
        ok, sc = jax.device_get(
            execute_probe(
                leaf.device, fq, jnp.asarray(probe),
                use_pallas=self._use_pallas,
                has_ef=work_has_ef(leaf.packed.blk_doc_bits, work[0], work[5], dev=leaf.device),
                filters=filters,
            )
        )
        return np.asarray(ok)[: len(locs)], np.asarray(sc)[: len(locs)]
