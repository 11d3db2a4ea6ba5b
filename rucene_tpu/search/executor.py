"""The batched boolean/BM25 query engine — one jitted program per
(B, T, NB, k, segment-bucket) shape.

Where the reference walks one scorer tree per query with skip-list leapfrog
(rucene src/core/search/scorer/conjunction_scorer.rs, bulk_scorer.rs:89-154),
this engine executes a BATCH of queries against a segment in one device
program:

  1. gather + bit-unpack every 128-doc block of every query term slot
     (ops.decode), prefix-summing deltas to absolute doc ids;
  2. score every posting lane with BM25 (norm byte -> cache lookup, exact
     reference float semantics, bm25_similarity.rs:185-215);
  3. scatter-add scores and clause-match counts into dense per-query
     accumulators over the doc space (score-at-a-time evaluation; the
     static unroll over term slots keeps f32 summation in clause order);
  4. apply boolean semantics (must/filter counts, min_should_match,
     must_not, live docs) as a mask;
  5. exact tie-broken vectorized top-k (ops.topk).

Clause kinds follow BooleanQuery (reference boolean_query.rs:29):
SHOULD=0 MUST=1 FILTER=2 MUST_NOT=3.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import DeviceSegment
from rucene_tpu.ops.decode import decode_doc_blocks, decode_freq_blocks
from rucene_tpu.ops.topk import topk_score_doc

OCC_SHOULD = 0
OCC_MUST = 1
OCC_FILTER = 2
OCC_MUST_NOT = 3


class QueryBatch(NamedTuple):
    """Device-side form of a batch of (pre-rewritten) boolean queries.

    All term resolution happened on the host: each slot is a term's block
    range in the target segment plus its scoring weight. A slot with
    block_count == 0 is inactive.
    """

    block_start: jax.Array  # i32[B,T]
    block_count: jax.Array  # i32[B,T]
    weight: jax.Array  # f32[B,T] = boost * idf * (k1+1), folded on host
    field_id: jax.Array  # i32[B,T] norms/cache row
    occur: jax.Array  # i32[B,T]
    n_required: jax.Array  # i32[B] count of MUST+FILTER clauses
    min_should: jax.Array  # i32[B] effective minimum SHOULD matches
    cache: jax.Array  # f32[F,256] k1*((1-b)+b*NORM_TABLE/avgdl) per field row


@partial(jax.jit, static_argnames=("k", "nb_max"))
def execute_batch(
    dev: DeviceSegment, q: QueryBatch, k: int, nb_max: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (scores f32[B,k], docs i32[B,k], total_hits i32[B])."""
    b, t_slots = q.block_start.shape
    md = dev.max_doc_padded
    nb_lane = jnp.arange(nb_max, dtype=jnp.int32)
    norm_flat = dev.norms.reshape(-1)
    cache_flat = q.cache.reshape(-1)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None, None]

    acc_score = jnp.zeros((b, md), jnp.float32)
    acc_counts = jnp.zeros((b, md), jnp.int32)

    for t in range(t_slots):  # static unroll: exact clause-order f32 sums
        bc = q.block_count[:, t]  # [B]
        blk = q.block_start[:, t][:, None] + nb_lane[None, :]  # [B,NB]
        bvalid = nb_lane[None, :] < bc[:, None]
        safe = jnp.where(bvalid, blk, 0)
        off = dev.blk_off[safe]
        dbits = dev.blk_doc_bits[safe]
        fbits = dev.blk_freq_bits[safe]
        base = dev.blk_base[safe]
        cnt = jnp.where(bvalid, dev.blk_count[safe], 0)

        docs, valid = decode_doc_blocks(dev.data, off, dbits, base, cnt)  # [B,NB,128]
        freqs = decode_freq_blocks(dev.data, off, dbits, fbits, valid)

        fid = q.field_id[:, t]  # [B]
        docc = jnp.where(valid, docs, 0)
        norm_byte = norm_flat[fid[:, None, None] * md + docc].astype(jnp.int32)
        cval = cache_flat[fid[:, None, None] * 256 + norm_byte]
        tf = freqs.astype(jnp.float32)
        sc = q.weight[:, t][:, None, None] * tf / (tf + cval)

        occ = q.occur[:, t]  # [B]
        scoring = (occ == OCC_SHOULD) | (occ == OCC_MUST)
        sc = jnp.where(valid & scoring[:, None, None], sc, 0.0)
        enc = (
            jnp.where((occ == OCC_MUST) | (occ == OCC_FILTER), 1 << 16, 0)
            + jnp.where(occ == OCC_SHOULD, 1 << 8, 0)
            + jnp.where(occ == OCC_MUST_NOT, 1, 0)
        ).astype(jnp.int32)

        target = jnp.where(valid, docs, md + 1)  # out of range -> dropped
        acc_score = acc_score.at[rows, target].add(sc, mode="drop")
        acc_counts = acc_counts.at[rows, target].add(
            jnp.where(valid, enc[:, None, None], 0), mode="drop"
        )

    req_count = acc_counts >> 16
    should_count = (acc_counts >> 8) & 0xFF
    has_not = (acc_counts & 0xFF) > 0
    match = (
        (req_count == q.n_required[:, None])
        & (should_count >= q.min_should[:, None])
        & jnp.logical_not(has_not)
        & dev.live[None, :]
    )
    scores = jnp.where(match, acc_score, -jnp.inf)
    top_scores, top_docs = topk_score_doc(scores, k)
    total_hits = jnp.sum(match, axis=1).astype(jnp.int32)
    return top_scores, top_docs, total_hits


@partial(jax.jit, static_argnames=("k",))
def execute_match_all(
    dev: DeviceSegment, boost: jax.Array, k: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """MatchAllDocsQuery / pure constant-score path: every live doc matches
    with a constant score (reference match_all_query.rs)."""
    md = dev.max_doc_padded
    scores = jnp.where(dev.live[None, :], boost[:, None], -jnp.inf)
    top_scores, top_docs = topk_score_doc(scores, k)
    total_hits = jnp.sum(dev.live).astype(jnp.int32)[None].repeat(boost.shape[0])
    return top_scores, top_docs, total_hits
