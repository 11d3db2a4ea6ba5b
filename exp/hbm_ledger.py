"""Host-side HBM ledger for the 8.8M bench config (no TPU touched).

The 8.8M runbook steps crashed the TPU worker inside the FIRST (serial,
warmup) batch's phrase plane collect (exp/logs/bench_8m_k100_r4.log).
Before burning chip time on blind fixes, compute what the resident +
transient HBM picture actually is at 8.8M docs from the cached packed
segment's metadata alone:

  - decoded residency bytes (docs_dec i32 + freqs_dec u16/u8 + norm u8)
  - dense tf-plane selection bytes under plane_policy(mdp)
  - the phrase plane budget formula's output, plane size, live-pin cap
  - per-batch [B, md] accumulator + plane-search transient sizes

Usage: python exp/hbm_ledger.py [docs=8800000]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.codec.device import plane_policy, select_plane_terms  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402

GB = 1 << 30
MB = 1 << 20


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_800_000
    cache = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    name = f"bench-zipf-{n_docs}"
    t0 = time.time()
    packed = segfiles.read_segment(FSDirectory(cache), name)
    print(f"# loaded {name} in {time.time()-t0:.0f}s")

    mdp = int(np.ceil(packed.max_doc / 8) * 8)
    nb = int(packed.blk_off.shape[0])
    counts = np.asarray(packed.blk_count)
    slots = int(counts.shape[0] and np.sum(np.maximum(counts, 0)))
    nb_r = (max(nb, 8) + 7) // 8 * 8
    # decoded planes are block-slotted: 128 slots per block row
    blk_slots = nb_r * 128
    dec_bytes = blk_slots * (4 + 2 + 1)
    print(f"max_doc={packed.max_doc} mdp={mdp} blocks={nb} postings={slots}")
    print(f"decoded residency: {dec_bytes/GB:.2f} GB ({blk_slots} slots)")

    budget, df_min = plane_policy(mdp)
    sel = select_plane_terms(packed, mdp, budget, df_min)
    if sel is None:
        print("tf planes: none")
        tf_bytes = 0
    else:
        _blk, _slot, slot_map = sel
        p = len(set(slot_map.values())) if hasattr(slot_map, "values") else 0
        # add_tf_planes rounds P up; plane cost = P * mdp u8
        tf_bytes = (p if p else 0) * mdp
        print(f"tf planes: policy budget={budget/GB:.2f} GB df_min={df_min} "
              f"selected={p} planes = {tf_bytes/GB:.2f} GB")

    dev_bytes = dec_bytes + tf_bytes  # + small block metadata
    phrase_budget = max(1 * GB, min(6 * GB, ((11 * GB) - dev_bytes) // 2))
    from rucene_tpu.ops.phrase_plane import WORDS

    plane_bytes = mdp * (WORDS * 4 + 1)
    max_terms_live = max(8, (phrase_budget // 4) // max(plane_bytes, 1))
    print(f"phrase plane: {plane_bytes/MB:.0f} MB each, budget="
          f"{phrase_budget/GB:.2f} GB, live cap={max_terms_live} terms "
          f"({max_terms_live*plane_bytes/GB:.2f} GB pinned)")

    for b in (32, 256):
        acc = b * mdp * 4
        print(f"[B={b}, md] f32 accumulator: {acc/GB:.2f} GB")
    chunk = max(1, min(64, (64 * MB) // max(mdp, 1)))
    r_pad = 1 << (chunk - 1).bit_length()
    print(f"plane-search chunk_rows={chunk} r_pad={r_pad}: one [R,md] f32 = "
          f"{r_pad*mdp*4/GB:.2f} GB")

    total_resident = dev_bytes + max_terms_live * plane_bytes
    print(f"RESIDENT worst case (decoded+tf+pinned phrase planes): "
          f"{total_resident/GB:.2f} GB of 15.75 GB HBM")


if __name__ == "__main__":
    main()
