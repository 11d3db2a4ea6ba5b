"""Multi-host partial index loading (parallel/sharded.py from_directory):
per-process segment-group loading driven by segments_N dims metadata."""

import numpy as np
import pytest

import jax

from rucene_tpu import Document, IndexSearcher, StringField, Term, TermQuery, TextField
from rucene_tpu.index.reader import open_directory_reader
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher, make_mesh
from rucene_tpu.store.directory import FSDirectory
from tests.conftest import random_corpus
from tests.hitcheck import assert_hits_equal


class CountingDirectory(FSDirectory):
    def __init__(self, path):
        super().__init__(path)
        self.reads: list[str] = []

    def read_file(self, name: str) -> bytes:
        self.reads.append(name)
        return super().read_file(name)

    def mmap_file(self, name: str):  # lazy .seg opens route through here
        self.reads.append(name)
        return super().mmap_file(name)


@pytest.fixture(scope="module")
def committed_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("partial")
    rng = np.random.default_rng(77)
    texts = random_corpus(rng, 1200)
    w = IndexWriter(FSDirectory(path), IndexWriterConfig(max_buffered_docs=150))
    for i, t in enumerate(texts):
        d = Document()
        d.add(StringField("id", str(i), stored=True))
        d.add(TextField("body", t))
        w.add_document(d)
    w.commit()
    w.close()
    return path, texts


def test_dims_metadata_recorded(committed_dir):
    path, _ = committed_dir
    from rucene_tpu.codec import files as segfiles

    infos = segfiles.read_segments_file(FSDirectory(path))
    assert len(infos.segments) > 4
    for i in infos.segments:
        assert i.dims is not None
        assert i.dims["num_blocks"] >= 0 and i.dims["data_words"] > 0
        assert "body" in i.dims["fields"]
        assert i.dims["stats"]["body"][0] == i.max_doc


def test_partial_full_equals_reader_path(committed_dir):
    """from_directory with every shard owned == classic ShardedIndex."""
    path, texts = committed_dir
    mesh = make_mesh(4, 2)
    ref = ShardedSearcher(ShardedIndex(mesh, open_directory_reader(FSDirectory(path))))
    got = ShardedSearcher(ShardedIndex.from_directory(mesh, FSDirectory(path)))
    assert got.index.partial
    words = sorted({w for t in texts[:40] for w in t.split()})[:12]
    queries = [TermQuery(Term("body", w)) for w in words]
    r1 = ref.search_batch(queries, k=12)
    r2 = got.search_batch(queries, k=12)
    for a, b in zip(r1, r2):
        assert a.total_hits == b.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in a.score_docs],
            [(sd.doc, sd.score) for sd in b.score_docs],
        )


def test_partial_loads_only_owned_segments(committed_dir):
    path, _ = committed_dir
    mesh = make_mesh(4, 2)
    d = CountingDirectory(path)
    idx = ShardedIndex.from_directory(mesh, d, owned_shards={1, 2})
    seg_reads = [n for n in d.reads if n.endswith(".seg")]
    owned_names = {
        i.name for si in (1, 2) for i in _groups_meta(d, mesh)[si]
    }
    assert {n[: -len(".seg")] for n in seg_reads} == owned_names
    # unowned views absent, owned present
    assert idx.views[0] is None and idx.views[3] is None
    assert idx.views[1] is not None and idx.views[2] is not None
    # stats came from metadata (all fields known without loading all)
    assert idx.global_stats["body"].doc_count == 1200


def _groups_meta(directory, mesh):
    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.parallel.sharded import _partition_leaves

    infos = segfiles.read_segments_file(directory)
    return _partition_leaves(infos.segments, mesh.shape["shard"])


def test_partial_phrases_in_program(committed_dir):
    """Phrase rows execute on the mesh in partial mode (previously raised
    NotImplementedError — VERDICT r2 item 3)."""
    from rucene_tpu import PhraseQuery

    path, texts = committed_dir
    mesh = make_mesh(4, 2)
    single = ShardedSearcher(
        ShardedIndex(mesh, open_directory_reader(FSDirectory(path)))
    )
    partial = ShardedSearcher(ShardedIndex.from_directory(mesh, FSDirectory(path)))
    assert partial.index.partial
    bigrams = []
    for t in texts[:50]:
        ws = t.split()
        if len(ws) >= 2:
            bigrams.append((ws[0], ws[1]))
    queries = [PhraseQuery("body", list(bg)) for bg in bigrams[:6]]
    queries.append(PhraseQuery("body", list(bigrams[6][:2]), slop=3))
    r1 = single.search_batch(queries, k=10)
    r2 = partial.search_batch(queries, k=10)
    assert any(td.total_hits > 0 for td in r1), "test phrases matched nothing"
    for a, b in zip(r1, r2):
        assert a.total_hits == b.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in a.score_docs],
            [(sd.doc, sd.score) for sd in b.score_docs],
        )


def test_partial_local_doc_freq(committed_dir):
    path, texts = committed_dir
    mesh = make_mesh(4, 2)
    full = ShardedIndex.from_directory(mesh, FSDirectory(path))
    word = texts[0].split()[0]
    reader = open_directory_reader(FSDirectory(path))
    assert full.local_doc_freq("body", word) == reader.doc_freq("body", word)


def test_partial_covers_full_algebra(committed_dir):
    """Mixed phrase+term booleans, groups, dismax and spans serve in
    partial mode (previously NotImplementedError — VERDICT r2 item 4):
    local exact evaluation with global stats + allgather top-k merge."""
    from rucene_tpu import (
        BooleanQuery,
        DisjunctionMaxQuery,
        PhraseQuery,
        Term,
        TermQuery,
    )
    from rucene_tpu.search.spans import SpanNearQuery, SpanTermQuery

    path, texts = committed_dir
    mesh = make_mesh(4, 2)
    plain = IndexSearcher(open_directory_reader(FSDirectory(path)))
    partial = ShardedSearcher(ShardedIndex.from_directory(mesh, FSDirectory(path)))
    assert partial.index.partial

    ws = texts[0].split()
    w0, w1 = ws[0], ws[1]
    queries = []
    mixed = BooleanQuery()  # phrase + term in one boolean
    mixed.must(PhraseQuery("body", [w0, w1]))
    mixed.should(TermQuery(Term("body", "the")))
    queries.append(mixed)
    grouped = BooleanQuery()  # nested pure-SHOULD group
    inner = BooleanQuery()
    inner.should(TermQuery(Term("body", w0)))
    inner.should(TermQuery(Term("body", "the")))
    grouped.must(inner)
    grouped.must(TermQuery(Term("body", w1)))
    queries.append(grouped)
    queries.append(
        DisjunctionMaxQuery(
            [TermQuery(Term("body", w0)), TermQuery(Term("body", "the"))],
            tie_breaker=0.4,
        )
    )
    queries.append(
        SpanNearQuery(
            [SpanTermQuery(Term("body", w0)), SpanTermQuery(Term("body", w1))],
            slop=2,
            in_order=False,
        )
    )
    r1 = plain.search_batch(queries, k=10)
    r2 = partial.search_batch(queries, k=10)
    assert any(td.total_hits > 0 for td in r1), "algebra rows matched nothing"
    for a, b in zip(r1, r2):
        assert a.total_hits == b.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in a.score_docs],
            [(sd.doc, sd.score) for sd in b.score_docs],
        )
