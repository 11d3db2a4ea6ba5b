"""Lazy (mmap) segment opening: zero-copy section views, correctness parity
with the eager CRC-verified read, and corruption still caught by CheckIndex
(reference mmap_index_input.rs:126)."""

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec import files as segfiles
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.store.directory import FSDirectory


@pytest.fixture(scope="module")
def seg_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("lazyseg")
    rng = np.random.default_rng(9)
    buf = SegmentBuffer()
    for i in range(500):
        d = rt.Document()
        d.add(rt.TextField("body", " ".join(f"w{int(x)%40}" for x in rng.zipf(1.4, size=12))))
        d.add(rt.StringField("id", str(i), stored=True))
        d.add(rt.NumericDocValuesField("rank", i % 7))
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    segfiles.write_segment(FSDirectory(str(path)), "lz", packed)
    return str(path)


def test_lazy_matches_eager(seg_dir):
    d = FSDirectory(seg_dir)
    lazy = segfiles.read_segment(d, "lz", lazy=True)
    eager = segfiles.read_segment(d, "lz", lazy=False)
    np.testing.assert_array_equal(lazy.data, eager.data)
    np.testing.assert_array_equal(lazy.blk_off, eager.blk_off)
    np.testing.assert_array_equal(lazy.positions, eager.positions)
    for f in eager.fields:
        assert lazy.fields[f].terms == eager.fields[f].terms
        np.testing.assert_array_equal(lazy.fields[f].doc_freq, eager.fields[f].doc_freq)
    np.testing.assert_array_equal(lazy.norms["body"], eager.norms["body"])
    lv, lp = lazy.numeric_dv["rank"]
    ev, ep = eager.numeric_dv["rank"]
    np.testing.assert_array_equal(lv, ev)
    assert lazy.stored[3]["id"] == eager.stored[3]["id"]


def test_lazy_sections_are_views(seg_dir):
    """Big planes must be zero-copy views into the mapping, not copies."""
    lazy = segfiles.read_segment(FSDirectory(seg_dir), "lz", lazy=True)
    assert lazy.data.base is not None  # frombuffer view, not a fresh copy
    assert not lazy.data.flags.writeable


def test_lazy_search_end_to_end(seg_dir):
    lazy = segfiles.read_segment(FSDirectory(seg_dir), "lz")
    eager = segfiles.read_segment(FSDirectory(seg_dir), "lz", lazy=False)
    s1 = rt.IndexSearcher(IndexReader([SegmentSnapshot("lz", lazy)]))
    s2 = rt.IndexSearcher(IndexReader([SegmentSnapshot("lz", eager)]))
    for w in ("w1", "w3", "w7"):
        a = s1.search(rt.TermQuery(rt.Term("body", w)), k=10)
        b = s2.search(rt.TermQuery(rt.Term("body", w)), k=10)
        assert a.total_hits == b.total_hits
        assert [sd.doc for sd in a.score_docs] == [sd.doc for sd in b.score_docs]


def test_header_corruption_detected_lazily(seg_dir, tmp_path):
    import shutil

    dst = tmp_path / "corrupt"
    shutil.copytree(seg_dir, dst)
    p = dst / "lz.seg"
    blob = bytearray(p.read_bytes())
    blob[0] ^= 0xFF  # header magic
    p.write_bytes(bytes(blob))
    with pytest.raises(Exception, match="magic"):
        segfiles.read_segment(FSDirectory(str(dst)), "lz", lazy=True)


def test_payload_corruption_caught_by_eager_crc(seg_dir, tmp_path):
    """Lazy open skips the CRC pass by design; the eager path (CheckIndex's
    read mode) still catches mid-file corruption."""
    import shutil

    dst = tmp_path / "corrupt2"
    shutil.copytree(seg_dir, dst)
    p = dst / "lz.seg"
    blob = bytearray(p.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    p.write_bytes(bytes(blob))
    with pytest.raises(Exception, match="checksum"):
        segfiles.read_segment(FSDirectory(str(dst)), "lz", lazy=False)
