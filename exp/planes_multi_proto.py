"""PROMOTED (r5): batched position-plane build now lives in
ops/phrase_plane.build_position_planes_multi (fixed work capacity +
dynamic chunk count so compiles don't fork per work size); this file
keeps the original standalone parity check against the single-term
builder for quick manual runs.

Hypothesis (r4, confirmed): the phrase class's 623 ms/batch at 1M docs is
dominated by plane-cache thrash — 256 distinct bigrams reference ~500
distinct terms x 17 MB planes = 8.7 GB > the ~5.3 GB budget, so the LRU
rebuilds EVERY plane EVERY batch, one dispatch per term (~1 ms tunnel
overhead each). Fix: build all of a group's missing planes in ONE
dispatch (search/phrase_path._phrase_planes_for_many).
Run (TPU idle!): BENCH_CPU=1 python exp/planes_multi_proto.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rucene_tpu.codec.device import DeviceSegment  # noqa: E402
from rucene_tpu.ops.phrase_plane import (  # noqa: E402
    BUILD_CHUNK,
    FMAX,
    PMAX,
    WORDS,
    build_position_plane,
)


@partial(jax.jit, static_argnames=("n_planes", "has_ef"))
def build_position_planes_multi(
    dev: DeviceSegment,
    wi_block: jax.Array,  # i32[W] global block ids across ALL terms (padded)
    wi_valid: jax.Array,  # bool[W]
    wi_plane: jax.Array,  # i32[W] destination plane index per item
    wi_pos_width: jax.Array,  # i32[W] per-item packed position-delta width
    wi_pos_start: jax.Array,  # i32[W] per-item word offset of the stream
    n_planes: int,
    has_ef: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """-> (planes u32[n_planes, md, WORDS], overflow bool[n_planes, md]).

    N single-term scatter-accumulation builds fused into ONE program: the
    destination word index gains a plane_idx * md * WORDS stride, so the
    (doc, position) uniqueness argument of build_position_plane holds
    per-plane and the scatter-ADD stays an OR. One dispatch replaces one
    per term (~1 ms tunnel + trace tax each — the measured phrase-class
    bottleneck when the working set exceeds the plane-cache budget)."""
    md = dev.max_doc_padded
    w_items = wi_block.shape[0]
    c = min(w_items, BUILD_CHUNK)
    n_chunks = w_items // c
    limit = dev.positions.shape[0] - 1
    fidx = jnp.arange(FMAX, dtype=jnp.int32)
    plane_words = md * WORDS

    def chunk_step(carry, xs):
        planes_flat, overflow = carry
        blk, valid_c, pidx, pw, ws = xs
        off = dev.blk_off[blk]
        dbits = dev.blk_doc_bits[blk]
        fbits = dev.blk_freq_bits[blk]
        base = dev.blk_base[blk]
        cnt = jnp.where(valid_c, dev.blk_count[blk], 0)

        if dev.docs_dec is not None:
            from rucene_tpu.ops.decode import INVALID_DOC

            sb = jnp.clip(blk, 0, dev.docs_dec.shape[0] - 1)
            valid = jnp.arange(128, dtype=jnp.int32)[None, :] < cnt[:, None]
            docs = jnp.where(valid, dev.docs_dec[sb], INVALID_DOC)
            freqs = jnp.where(valid, dev.freqs_dec[sb].astype(jnp.int32), 0)
        else:
            from rucene_tpu.ops.decode import (
                decode_doc_blocks,
                decode_freq_blocks,
            )

            docs, valid = decode_doc_blocks(
                dev.data, off, dbits, base, cnt, has_ef=has_ef
            )
            freqs = decode_freq_blocks(dev.data, off, dbits, fbits, valid)
        pos_off = dev.blk_pos_base[blk][:, None] + (
            jnp.cumsum(freqs, axis=1) - freqs
        )

        occ = pos_off[:, :, None] + fidx[None, None, :]  # [C,128,FMAX]
        pvalid = valid[:, :, None] & (fidx[None, None, :] < freqs[:, :, None])
        w32 = pw.astype(jnp.int32)  # [C] per-item width
        vmask = jnp.where(
            w32 >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << w32.astype(jnp.uint32)) - 1,
        )  # [C]
        bitpos = occ * w32[:, None, None]
        widx = ws.astype(jnp.int32)[:, None, None] + (bitpos >> 5)
        shift = (bitpos & 31).astype(jnp.uint32)
        w0 = dev.positions[jnp.clip(widx, 0, limit)]
        w1 = dev.positions[jnp.clip(widx + 1, 0, limit)]
        lo = w0 >> shift
        hi = jnp.where(
            shift == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shift)
        )
        deltas = ((lo | hi) & vmask[:, None, None]).astype(jnp.int32)
        deltas = jnp.where(pvalid, deltas, 0)
        pwin = jnp.cumsum(deltas, axis=-1)

        over_lane = valid & (
            (freqs > FMAX)
            | (jnp.max(jnp.where(pvalid, pwin, 0), axis=-1) >= PMAX)
        )
        # overflow rows are [n_planes, md+1] flattened; md row per plane is
        # the drop bucket
        ov_idx = jnp.where(
            valid, pidx[:, None] * (md + 1) + docs, n_planes * (md + 1)
        )
        overflow = overflow.at[ov_idx].max(over_lane, mode="drop")

        on = pvalid & (pwin < PMAX)
        word_idx = jnp.where(
            on,
            pidx[:, None, None] * plane_words
            + docs[:, :, None].astype(jnp.int32) * WORDS
            + (pwin >> 5),
            n_planes * plane_words,  # global drop bucket
        )
        bitval = jnp.where(
            on,
            jnp.uint32(1) << (pwin & 31).astype(jnp.uint32),
            jnp.uint32(0),
        )
        planes_flat = planes_flat.at[word_idx].add(bitval, mode="drop")
        return (planes_flat, overflow), None

    init = (
        jnp.zeros((n_planes * plane_words + WORDS,), jnp.uint32),
        jnp.zeros((n_planes * (md + 1) + 1,), jnp.bool_),
    )
    xs = (
        wi_block.reshape(n_chunks, c),
        wi_valid.reshape(n_chunks, c),
        wi_plane.reshape(n_chunks, c),
        wi_pos_width.reshape(n_chunks, c),
        wi_pos_start.reshape(n_chunks, c),
    )
    (planes_flat, overflow), _ = jax.lax.scan(chunk_step, init, xs)
    planes = planes_flat[: n_planes * plane_words].reshape(
        n_planes, md, WORDS
    )
    ov = overflow[: n_planes * (md + 1)].reshape(n_planes, md + 1)[:, :md]
    return planes, ov


def parity_check():
    """Tiny corpus: multi build == per-term builds, bit for bit."""
    from rucene_tpu import Document, TextField
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.util import next_pow2

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    buf = SegmentBuffer()
    for _ in range(3000):
        n = rng.integers(3, 40)
        words = rng.choice(vocab, size=n, p=None)
        d = Document()
        d.add(TextField("body", " ".join(words)))
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    reader = IndexReader([SegmentSnapshot("s", packed)])
    leaf = reader.leaves[0]
    dev = leaf.device

    terms = ["w0", "w3", "w17", "w39", "w8"]
    # single-term reference builds
    singles = []
    for t in terms:
        rec = leaf.term_record("body", t)
        blocks = np.arange(
            rec.block_start, rec.block_start + rec.block_count, dtype=np.int32
        )
        w_pad = next_pow2(max(len(blocks), 1), 8)
        wb = np.zeros(w_pad, np.int32)
        wv = np.zeros(w_pad, bool)
        wb[: len(blocks)] = blocks
        wv[: len(blocks)] = True
        p, o = build_position_plane(
            dev, jnp.asarray(wb), jnp.asarray(wv),
            jnp.asarray(np.int32(rec.pos_width)),
            jnp.asarray(np.int32(rec.pos_word_start)),
        )
        singles.append((np.asarray(p), np.asarray(o)))

    # one multi build
    wb_l, wv_l, wp_l, pw_l, ws_l = [], [], [], [], []
    for i, t in enumerate(terms):
        rec = leaf.term_record("body", t)
        blocks = np.arange(
            rec.block_start, rec.block_start + rec.block_count, dtype=np.int32
        )
        wb_l.append(blocks)
        wv_l.append(np.ones(len(blocks), bool))
        wp_l.append(np.full(len(blocks), i, np.int32))
        pw_l.append(np.full(len(blocks), rec.pos_width, np.int32))
        ws_l.append(np.full(len(blocks), rec.pos_word_start, np.int32))
    wb = np.concatenate(wb_l)
    w_pad = next_pow2(max(len(wb), 1), 8)

    def pad(a, fill=0):
        out = np.full(w_pad, fill, a.dtype)
        out[: len(a)] = a
        return out

    planes, ovs = build_position_planes_multi(
        dev,
        jnp.asarray(pad(wb)),
        jnp.asarray(pad(np.concatenate(wv_l).astype(bool), False)),
        jnp.asarray(pad(np.concatenate(wp_l))),
        jnp.asarray(pad(np.concatenate(pw_l), 1)),
        jnp.asarray(pad(np.concatenate(ws_l))),
        n_planes=len(terms),
    )
    planes = np.asarray(planes)
    ovs = np.asarray(ovs)
    for i, (p, o) in enumerate(singles):
        assert (planes[i] == p).all(), f"plane mismatch term {terms[i]}"
        assert (ovs[i] == o).all(), f"overflow mismatch term {terms[i]}"
    print(f"parity OK over {len(terms)} terms")


if __name__ == "__main__":
    parity_check()
