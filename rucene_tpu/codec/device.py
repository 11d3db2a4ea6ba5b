"""Device-resident segment arrays (the read-side analog of SegmentCoreReaders,
reference rucene src/core/index/reader/segment_reader.rs:53).

A DeviceSegment is an immutable pytree of jnp arrays living in HBM. Shapes
are padded to power-of-two buckets so NRT refreshes reuse compiled
executables. Live-doc masks are functional updates (deletes swap in a new
mask without touching postings — the analog of per-generation .liv files).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rucene_tpu.codec.postings import PackedSegment
from rucene_tpu.util import next_pow2, round_up


class DeviceSegment(NamedTuple):
    """All device tensors for one segment (a pytree; leaves are jnp arrays)."""

    data: jnp.ndarray  # u32[Wp] packed postings words (padded)
    blk_off: jnp.ndarray  # i32[NBp]
    blk_doc_bits: jnp.ndarray  # i32[NBp]
    blk_freq_bits: jnp.ndarray  # i32[NBp]
    blk_base: jnp.ndarray  # i32[NBp]
    blk_count: jnp.ndarray  # i32[NBp]  (0 for padding blocks)
    blk_max_freq: jnp.ndarray  # i32[NBp]
    norms: jnp.ndarray  # u8[F, MDp] (omit-norms fields: zero rows)
    live: jnp.ndarray  # bool[MDp]  (padding docs are dead)
    positions: jnp.ndarray  # u32[Pp] packed per-term position-delta streams
    blk_pos_base: jnp.ndarray  # i32[NBp] within-term occurrence index of block start
    # --- decoded residency (add_decoded_planes) ---
    # TPU-first inversion of the reference's pack-everything economy: HBM
    # is 16 GB, so postings live DECODED on device (~11 B/posting) and the
    # search hot path is row gathers — no per-dispatch unpack kernel at
    # all. None => packed-only (decode per dispatch, the low-HBM mode).
    docs_dec: jnp.ndarray | None = None  # i32[NBr,128] local doc ids, INVALID pad
    freqs_dec: jnp.ndarray | None = None  # u16|i32[NBr,128], 0 pad
    norm_dec: jnp.ndarray | None = None  # u8[NBr,128] norm bytes (cval rebuilds)
    blk_fid: jnp.ndarray | None = None  # i32[NBr] norms/cache row per block
    # --- dense tf planes (add_tf_planes) ---
    # one u8 row per HOT term: tf_planes[slot, doc] = term freq (0 absent).
    # Boolean rows whose terms all have planes score as fused dense
    # elementwise math over [B, md] — no probe compares, no scatter, no
    # per-block host tables (the TPU answer to skip-list leapfrog for
    # high-df conjunctions/disjunctions). Term -> slot lives host-side
    # (SegmentSnapshot.plane_slots, keyed by the term's block_start).
    tf_planes: jnp.ndarray | None = None  # u8[P, MDp]

    @property
    def max_doc_padded(self) -> int:
        return self.live.shape[0]

    # packed-core field names (everything before the decoded-residency
    # extras): the sharded stacker iterates these — shards ship packed
    # and decode per dispatch (decoded stacking would multiply HBM)
    CORE_FIELDS = (
        "data", "blk_off", "blk_doc_bits", "blk_freq_bits", "blk_base",
        "blk_count", "blk_max_freq", "norms", "live", "positions",
        "blk_pos_base",
    )

    @property
    def num_norm_fields(self) -> int:
        return self.norms.shape[0]


def _pad1(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    out = np.full(n, fill, dtype=a.dtype)
    out[: len(a)] = a
    return out


def build_device_segment(
    packed: PackedSegment,
    live: np.ndarray | None = None,
    min_blocks: int = 1,
    min_words: int = 2,
    min_max_doc: int = 1,
    min_positions: int = 1,
    min_fields: int = 1,
    as_numpy: bool = False,
) -> DeviceSegment:
    """Upload a packed segment to the default device with bucketed padding.

    The min_* floors let callers force a common shape across segments so
    shards can be stacked along a leading axis (parallel.sharded); with
    as_numpy=True the leaves stay host-side numpy for such stacking.
    """
    nb = packed.num_blocks
    nbp = next_pow2(max(nb, min_blocks), 1)
    w = len(packed.data)
    # +2048 words so the pallas decoder's 1024-aligned 2048-word DMA windows
    # never run off the end; pow2 >= 2048 is always 1024-aligned
    wp = next_pow2(max(w + 2048, min_words), 2048)
    # doc axis: pow2 buckets for SMALL segments so NRT flush/merge sizes
    # share compiled executor shapes (a 21.8 s first-batch stall per new
    # merged-segment size, exp/logs/bench_nrt_r5e.log); big segments are
    # rare/stable and keep tight 1024-multiples (pow2 at 8.8M would
    # double every [md] array)
    md_raw = max(packed.max_doc, min_max_doc, 1)
    if md_raw <= (1 << 19):
        mdp = next_pow2(md_raw, 1024)
    else:
        mdp = round_up(md_raw, 1024)

    # field-id -> norms row (dense over indexed fields of this segment)
    n_fields = max((f.field_id for f in packed.fields.values()), default=-1) + 1
    n_fields = max(n_fields, 1, min_fields)
    norms = np.zeros((n_fields, mdp), dtype=np.uint8)
    for name, pf in packed.fields.items():
        if name in packed.norms:
            norms[pf.field_id, : packed.max_doc] = packed.norms[name]

    live_arr = np.zeros(mdp, dtype=bool)
    if live is None:
        live_arr[: packed.max_doc] = True
    else:
        live_arr[: packed.max_doc] = live[: packed.max_doc]

    npos = len(packed.positions)
    npp = next_pow2(max(npos, min_positions), 1)
    blk_pos_base = packed.blk_pos_base

    conv = (lambda x: x) if as_numpy else jnp.asarray
    return DeviceSegment(
        data=conv(_pad1(packed.data, wp)),
        blk_off=conv(_pad1(packed.blk_off, nbp)),
        blk_doc_bits=conv(_pad1(packed.blk_doc_bits, nbp, 1)),
        blk_freq_bits=conv(_pad1(packed.blk_freq_bits, nbp, 1)),
        blk_base=conv(_pad1(packed.blk_base, nbp, -1)),
        blk_count=conv(_pad1(packed.blk_count, nbp)),
        blk_max_freq=conv(_pad1(packed.blk_max_freq, nbp)),
        norms=conv(norms),
        live=conv(live_arr),
        positions=conv(_pad1(packed.positions.astype(np.uint32), npp, 0)),
        blk_pos_base=conv(_pad1(blk_pos_base.astype(np.int32), nbp)),
    )


def with_live(dev: DeviceSegment, live: np.ndarray) -> DeviceSegment:
    """Functional live-docs update (the .liv-generation analog)."""
    mdp = dev.max_doc_padded
    arr = np.zeros(mdp, dtype=bool)
    arr[: len(live)] = live[:mdp]
    return dev._replace(live=jnp.asarray(arr))


# --- decoded residency ----------------------------------------------------

DEC_CHUNK = 65536  # blocks per decode dispatch: [64K,128] i32 = 33.5 MB


def blk_fid_host(packed: PackedSegment) -> np.ndarray:
    """i32[NB] norms/cache row per block, from the per-term block ranges
    (vectorized ranges-concat; no per-term Python loop)."""
    nb = packed.num_blocks
    out = np.zeros(nb, np.int32)
    for pf in packed.fields.values():
        # clip, don't trust: a lazily-opened segment defers full-file CRC,
        # so a corrupt term table must map to garbage fids (caught by the
        # usual query/CheckIndex paths), never crash the device build
        starts = np.clip(np.asarray(pf.block_start, np.int64), 0, nb)
        counts = np.clip(np.asarray(pf.block_count, np.int64), 0, None)
        counts = np.minimum(counts, nb - starts)
        total = int(counts.sum())
        if total == 0:
            continue
        csum = np.cumsum(counts) - counts
        idx = np.arange(total) - csum.repeat(counts) + starts.repeat(counts)
        out[idx] = pf.field_id
    return out


def _decode_chunk(data, off, dbits, fbits, base, cnt, has_ef: bool):
    from rucene_tpu.ops.decode import (
        decode_doc_blocks,
        decode_freq_blocks,
        decode_norm_blocks,
    )

    docs, valid = decode_doc_blocks(data, off, dbits, base, cnt, has_ef=has_ef)
    freqs = decode_freq_blocks(data, off, dbits, fbits, valid)
    norm = decode_norm_blocks(data, off, dbits, fbits, valid)
    return docs, freqs, norm


_decode_chunk_jit = None


def add_decoded_planes(
    dev: DeviceSegment,
    n_blocks: int,
    blk_fid: np.ndarray,
    freq_dtype=None,
) -> DeviceSegment:
    """Decode every postings block ONCE into HBM-resident planes.

    The reference re-decodes blocks on every advance() (posting_reader.rs
    block loop); with 16 GB HBM the TPU answer is to pay ~11 B/posting of
    residency and make the serving path pure row gathers. EF/bitset blocks
    decode through the same chunks, so decoded mode also erases the has_ef
    executor shape split. Runs entirely on device — the host never
    materializes the planes (this sandbox charges ~0.5 ms per fresh page).
    """
    global _decode_chunk_jit
    import jax

    from rucene_tpu.util.packing import EF_TAG

    if _decode_chunk_jit is None:
        from functools import partial

        _decode_chunk_jit = jax.jit(
            _decode_chunk, static_argnames=("has_ef",)
        )
    nb_r = round_up(max(n_blocks, 8), 8)
    dbits_h = np.asarray(jax.device_get(dev.blk_doc_bits[:n_blocks]))
    if freq_dtype is None:
        freq_dtype = jnp.uint16  # blk max freqs checked by the caller
    d_parts, f_parts, n_parts = [], [], []
    for s in range(0, nb_r, DEC_CHUNK):
        e = min(s + DEC_CHUNK, nb_r)
        sl = slice(s, min(e, n_blocks))
        w = e - s
        pad = w - max(sl.stop - sl.start, 0)

        def grab(a, fill):
            part = a[sl]
            if pad:
                part = jnp.concatenate(
                    [part, jnp.full(pad, fill, a.dtype)]
                )
            return part
        has_ef = bool((dbits_h[sl] >= EF_TAG).any()) if sl.stop > sl.start else False
        docs, freqs, norm = _decode_chunk_jit(
            dev.data,
            grab(dev.blk_off, 0),
            grab(dev.blk_doc_bits, 1),
            grab(dev.blk_freq_bits, 1),
            grab(dev.blk_base, -1),
            grab(dev.blk_count, 0),
            has_ef=has_ef,
        )
        d_parts.append(docs)
        f_parts.append(freqs.astype(freq_dtype))
        n_parts.append(norm.astype(jnp.uint8))
    cat = (lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=0))
    fid = np.zeros(nb_r, np.int32)
    fid[:n_blocks] = blk_fid[:n_blocks]
    out = dev._replace(
        docs_dec=cat(d_parts),
        freqs_dec=cat(f_parts),
        norm_dec=cat(n_parts),
        blk_fid=jnp.asarray(fid),
    )
    import os

    if os.environ.get("RUCENE_DECODED_KEEP_PACKED") != "1":
        # every consumer (executor, phrase-plane build) reads the decoded
        # planes when present, so the packed word stream is dead weight in
        # HBM (2 GB at 8.8M docs) — swap in a stub and let it be freed
        out = out._replace(data=jnp.zeros(2048, dev.data.dtype))
    return out


# --- dense tf planes --------------------------------------------------------


def plane_policy(mdp: int) -> tuple[int, int]:
    """(budget_bytes, df_min) for dense tf planes under RUCENE_PLANES.

    auto: plane terms with df >= mdp/512 (the density where probe-compare
    volume beats a dense [md] u8 stream), capped by RUCENE_PLANES_MAX_MB
    (default 4 GB up to 4M docs; 2 GB above — at 8.8M docs decoded
    residency + the phrase position-plane cache + [B, md] batch
    transients all share the measured ~14 GB of usable HBM, so the
    resident tf-plane pin stays conservative; an explicit env cap always
    wins). "1" planes every term that fits (tests); "0" disables."""
    import os

    env = os.environ.get("RUCENE_PLANES", "auto")
    if env == "0":
        return 0, 0
    default_mb = 4096 if mdp <= (4 << 20) else 2048
    budget = int(os.environ.get("RUCENE_PLANES_MAX_MB", default_mb)) << 20
    if env == "1":
        return budget, 1
    if mdp < (1 << 19):
        # small segments: the lane paths are already near-free, and NRT
        # refreshes would pay the plane scatter per new segment
        return 0, 0
    # df >= mdp/512 measured best at 1M (div 2048 quadruples plane HBM and
    # starves the phrase position-plane cache: 1697 vs 3762 QPS on-chip);
    # routing additionally gates on the row's densest clause (searcher)
    div = int(os.environ.get("RUCENE_PLANES_DF_DIV", 512))
    return budget, max(mdp // div, 4)


def select_plane_terms(packed: PackedSegment, mdp: int, budget_bytes: int,
                       df_min: int):
    """Pick the plane-resident terms: df >= df_min, per-block max freq
    <= 255 (u8 exactness), ordered by (-df, block_start), capped by the
    byte budget. Returns (blk_ids i32[NBsel], slot_ids i32[NBsel],
    slots {block_start -> slot}) or None."""
    cap = budget_bytes // max(mdp, 1)
    if cap <= 0:
        return None
    bmf = np.asarray(packed.blk_max_freq)
    rows: list[tuple[int, int, int]] = []  # (df, block_start, block_count)
    for pf in packed.fields.values():
        df = np.asarray(pf.doc_freq)
        bs = np.asarray(pf.block_start)
        bc = np.asarray(pf.block_count)
        for t in np.flatnonzero((df >= df_min) & (bc > 0)):
            s, c = int(bs[t]), int(bc[t])
            if int(bmf[s : s + c].max()) > 255:
                continue
            rows.append((int(df[t]), s, c))
    if not rows:
        return None
    rows.sort(key=lambda r: (-r[0], r[1]))
    rows = rows[: int(cap)]
    slots = {s: i for i, (_df, s, _c) in enumerate(rows)}
    blk_ids = np.concatenate(
        [np.arange(s, s + c, dtype=np.int32) for _df, s, c in rows]
    )
    slot_ids = np.repeat(
        np.arange(len(rows), dtype=np.int32),
        np.asarray([c for _df, _s, c in rows]),
    )
    return blk_ids, slot_ids, slots


_scatter_planes_jit = None

PLANE_CHUNK = 65536  # blocks per scatter dispatch


def add_tf_planes(dev: DeviceSegment, packed: PackedSegment):
    """Build the hot-term u8 tf planes from the decoded residency
    (requires docs_dec). Returns (dev', {block_start -> plane slot});
    ({} when disabled / nothing qualifies). One scatter pass per segment —
    the serving path then reads planes with plain row gathers."""
    global _scatter_planes_jit
    import jax

    if dev.docs_dec is None or not packed.num_blocks:
        return dev, {}
    mdp = dev.max_doc_padded
    budget, df_min = plane_policy(mdp)
    if budget <= 0:
        return dev, {}
    sel = select_plane_terms(packed, mdp, budget, df_min)
    if sel is None:
        return dev, {}
    blk_ids, slot_ids, slots = sel
    p = next_pow2(len(slots), 8)
    if _scatter_planes_jit is None:
        def _scatter_chunk(planes, docs_dec, freqs_dec, blk, slot):
            nbr = docs_dec.shape[0]
            d = docs_dec[jnp.clip(blk, 0, nbr - 1)]  # [C,128] INVALID pad
            f = freqs_dec[jnp.clip(blk, 0, nbr - 1)].astype(planes.dtype)
            rows = jnp.broadcast_to(slot[:, None], d.shape)
            # INVALID_DOC (2^31-1) and padding slot==P are out of bounds ->
            # dropped; real (slot, doc) pairs are unique across blocks
            return planes.at[rows, d].set(f, mode="drop")

        _scatter_planes_jit = jax.jit(_scatter_chunk, donate_argnums=(0,))
    planes = jnp.zeros((p, mdp), jnp.uint8)
    for s in range(0, len(blk_ids), PLANE_CHUNK):
        e = min(s + PLANE_CHUNK, len(blk_ids))
        w = next_pow2(e - s, 8)
        blk = np.zeros(w, np.int32)
        slot = np.full(w, p, np.int32)  # pad rows scatter out of bounds
        blk[: e - s] = blk_ids[s:e]
        slot[: e - s] = slot_ids[s:e]
        planes = _scatter_planes_jit(
            planes, dev.docs_dec, dev.freqs_dec, jnp.asarray(blk),
            jnp.asarray(slot),
        )
    return dev._replace(tf_planes=planes), slots


def decoded_policy(n_blocks: int, max_freq: int) -> tuple[bool, object]:
    """(decode?, freq dtype) under the RUCENE_DECODED knob.

    auto: resident when the decoded planes (+ the per-stats cval table the
    searcher adds) fit RUCENE_DECODED_MAX_MB (default 4 GB)."""
    import os

    env = os.environ.get("RUCENE_DECODED", "auto")
    fdt = jnp.uint16 if max_freq < (1 << 16) else jnp.int32
    if env == "0":
        return False, fdt
    if env == "1":
        return True, fdt
    fb = 2 if fdt == jnp.uint16 else 4
    per_block = 128 * (4 + fb + 1 + 4) + 4  # docs+freq+norm+cval lanes, fid
    limit = int(os.environ.get("RUCENE_DECODED_MAX_MB", 4096)) << 20
    return n_blocks * per_block <= limit, fdt
