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

    @property
    def max_doc_padded(self) -> int:
        return self.live.shape[0]

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
    mdp = round_up(max(packed.max_doc, min_max_doc, 1), 1024)

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
