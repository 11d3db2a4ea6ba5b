"""Pallas decode kernel vs the XLA reference decoder — bit-identical on a
real packed segment (runs the kernel in interpret mode on CPU; on TPU the
same code path is exercised compiled via the bench / searcher)."""

import numpy as np
import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import build_device_segment
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.ops import decode as xdec
from rucene_tpu.ops.pallas_decode import G, decode_work_items_pallas
from tests.conftest import make_docs, random_corpus


def test_pallas_decode_matches_xla():
    rng = np.random.default_rng(31)
    texts = random_corpus(rng, 400)
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    dev = build_device_segment(packed)

    nb = packed.num_blocks
    w = ((nb + G - 1) // G) * G
    idx = np.arange(w) % nb  # pad by repeating valid blocks
    off = jnp.asarray(np.asarray(dev.blk_off)[idx])
    dbits = jnp.asarray(np.asarray(dev.blk_doc_bits)[idx])
    fbits = jnp.asarray(np.asarray(dev.blk_freq_bits)[idx])
    base = jnp.asarray(np.asarray(dev.blk_base)[idx])
    cnt = jnp.asarray(np.asarray(dev.blk_count)[idx])

    data2d = jax.lax.bitcast_convert_type(dev.data, jnp.int32).reshape(-1, 128)
    p_docs, p_freqs = decode_work_items_pallas(
        data2d, off, dbits, fbits, base, interpret=True
    )
    x_docs, x_valid = xdec.decode_doc_blocks(dev.data, off, dbits, base, cnt)
    x_freqs = xdec.decode_freq_blocks(dev.data, off, dbits, fbits, x_valid)

    valid = np.asarray(x_valid)
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_docs), 0), np.where(valid, np.asarray(x_docs), 0)
    )
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(p_freqs), 0), np.asarray(x_freqs)
    )
