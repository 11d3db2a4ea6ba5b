"""Staged repro of the 8.8M TPU worker crash (bench_8m_k100_r4.log).

Mirrors bench.py's cached 8.8M setup, then escalates in stages with
device memory stats printed between each, so the crashing program is
unambiguous:

  stage 0: device residency build (one term query)
  stage 1: ONE phrase query          -> plane build + plane search at 8.8M
  stage 2: the 4 phrase rows of the first bench batch
  stage 3: the exact first bench batch (32 mixed, serial)
  stage 4: second bench batch (new terms: plane LRU churn)

Run ALONE (single TPU holder): python exp/repro_8m.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
import jax  # noqa: E402

from rucene_tpu import IndexSearcher  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402

GB = 1 << 30


def mem(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
        print(
            f"## mem[{tag}]: in_use={st.get('bytes_in_use', 0)/GB:.2f} GB "
            f"peak={st.get('peak_bytes_in_use', 0)/GB:.2f} GB "
            f"limit={st.get('bytes_limit', 0)/GB:.2f} GB",
            flush=True,
        )
    except Exception as e:  # stats unsupported on some runtimes
        print(f"## mem[{tag}]: unavailable ({e})", flush=True)


def main():
    cache = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    t0 = time.time()
    packed = segfiles.read_segment(FSDirectory(cache), "bench-zipf-8800000")
    print(f"# loaded in {time.time()-t0:.0f}s", flush=True)
    vocab, probs = bench.zipf_vocab()
    phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    queries = bench.build_queries(128, vocab, probs, phrase_texts=phrase_texts)
    searcher = IndexSearcher(
        IndexReader([SegmentSnapshot("bench", packed)])
    )
    k = int(os.environ.get("BENCH_K", 100))

    def stage(tag, qs):
        t = time.time()
        print(f"== stage {tag}: {len(qs)} queries", flush=True)
        res = searcher.search_batch(qs, k=k)
        print(f"== stage {tag} OK in {time.time()-t:.1f}s "
              f"(hits[0]={res[0].total_hits})", flush=True)
        mem(tag)

    term_rows = [q for q in queries[:32] if type(q).__name__ == "TermQuery"]
    phrase_rows = [q for q in queries[:32] if type(q).__name__ == "PhraseQuery"]
    stage("0-residency", term_rows[:1])
    stage("1-one-phrase", phrase_rows[:1])
    stage("2-four-phrases", phrase_rows)
    stage("3-first-batch", queries[:32])
    stage("4-second-batch", queries[32:64])
    stage("5-third-batch", queries[64:96])
    print("ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
