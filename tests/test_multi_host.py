"""multi_host scaffolding: single-process (degenerate 1-host) the pod mesh
must reduce exactly to the sharded.py layout and produce identical search
results; the shard axis must stay within a host's device block."""

import numpy as np
import pytest

from rucene_tpu import IndexSearcher, Term, TermQuery
from rucene_tpu.parallel import multi_host as mh
from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher
from tests.conftest import make_docs, random_corpus
from tests.hitcheck import assert_hits_equal


def _reader(rng, n_docs, n_segments):
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot

    texts = random_corpus(rng, n_docs)
    per = n_docs // n_segments
    snaps = []
    for s in range(n_segments):
        buf = SegmentBuffer()
        for doc in make_docs(texts[s * per : (s + 1) * per]):
            buf.add_document(doc)
        snaps.append(SegmentSnapshot(f"s{s}", pack_segment(buf.finish())))
    return IndexReader(snaps), texts


def test_pod_mesh_single_host_layout():
    import jax

    mesh = mh.make_pod_mesh(shards_per_host=4)
    assert mesh.shape == {"shard": 4, "dp": len(jax.devices()) // 4}
    # initialize() is a no-op single-process
    mh.initialize()
    # shards_per_host must divide
    with pytest.raises(ValueError):
        mh.make_pod_mesh(shards_per_host=3)


def test_pod_mesh_search_matches_plain():
    rng = np.random.default_rng(3)
    reader, _ = _reader(rng, 160, 4)
    mesh = mh.make_pod_mesh(shards_per_host=4)
    searcher = ShardedSearcher(ShardedIndex(mesh, reader))
    plain = IndexSearcher(reader)
    queries = [TermQuery(Term("body", t)) for t in ["the", "fox", "of", "dog"]]
    a = plain.search_batch(queries, k=10)
    b = searcher.search_batch(queries, k=10)
    for ta, tb in zip(a, b):
        assert ta.total_hits == tb.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in ta.score_docs],
            [(sd.doc, sd.score) for sd in tb.score_docs],
        )


def test_query_slice_covers_batch():
    sl = mh.process_local_query_slice(100)
    assert sl == slice(0, 100)  # single process feeds everything
