"""Two-process distributed partial-load smoke test (CPU).

Validates the pod-scale path end-to-end on one machine: each process gets
4 virtual CPU devices, the mesh puts "shard" ACROSS processes
(multi_host.make_pod_mesh(partition="index")), and each process loads ONLY
its own segment groups (ShardedIndex.from_directory). Results must equal a
single-process IndexSearcher over the same index.

Run:
    python tools/multihost_smoke.py build     # writes /tmp/rtpu_mh/index
    python tools/multihost_smoke.py 0 &       # worker 0
    python tools/multihost_smoke.py 1         # worker 1
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX = "/tmp/rtpu_mh/index"
COORD = "localhost:9911"


def build():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import shutil

    import numpy as np

    from rucene_tpu import Document, TextField
    from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
    from rucene_tpu.store.directory import FSDirectory

    shutil.rmtree(INDEX, ignore_errors=True)
    os.makedirs(INDEX)
    rng = np.random.default_rng(3)
    w = IndexWriter(FSDirectory(INDEX), IndexWriterConfig(max_buffered_docs=100))
    for _ in range(800):
        d = Document()
        d.add(TextField("body", " ".join(f"w{rng.integers(0, 12)}" for _ in range(8))))
        w.add_document(d)
    w.commit()
    w.close()
    print("index built at", INDEX)


def worker(pid: int):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=2, process_id=pid
    )
    from rucene_tpu import Term, TermQuery
    from rucene_tpu.parallel import multi_host as mh
    from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher
    from rucene_tpu.store.directory import FSDirectory

    mesh = mh.make_pod_mesh(partition="index")
    idx = ShardedIndex.from_directory(mesh, FSDirectory(INDEX))
    print(f"[p{pid}] owned={sorted(idx.owned)} local_leaves={len(idx.leaves)}", flush=True)
    s = ShardedSearcher(idx)
    from rucene_tpu import PhraseQuery

    queries = [TermQuery(Term("body", w)) for w in ("w1", "w2", "w5", "w9")]
    # phrases run in-program in partial mode too (VERDICT r2 item 3)
    queries.append(PhraseQuery("body", ["w1", "w2"]))
    queries.append(PhraseQuery("body", ["w3", "w7"], slop=2))
    res = s.search_batch(queries, k=10)
    for r in res:
        print(
            f"[p{pid}] hits={r.total_hits} "
            f"top={[(sd.doc, round(sd.score, 4)) for sd in r.score_docs[:3]]}",
            flush=True,
        )
    # verify against a single-process searcher over the full index
    from rucene_tpu.index.reader import open_directory_reader
    from rucene_tpu.search.searcher import IndexSearcher

    want = IndexSearcher(open_directory_reader(FSDirectory(INDEX))).search_batch(
        queries, k=10
    )
    for qi, (a, b) in enumerate(zip(res, want)):
        assert a.total_hits == b.total_hits, (qi, a.total_hits, b.total_hits)
        ga = [(sd.doc, sd.score) for sd in a.score_docs]
        gb = [(sd.doc, sd.score) for sd in b.score_docs]
        assert {d for d, _ in ga} == {d for d, _ in gb}, (qi, ga, gb)
        wb = dict(gb)
        for d, sc in ga:
            assert abs(sc - wb[d]) <= 4e-7 * max(1.0, abs(wb[d])), (qi, d, sc, wb[d])
    print(f"[p{pid}] OK (parity incl. phrases)", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        worker(int(sys.argv[1]))
