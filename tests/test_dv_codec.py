"""Compressed doc-values codec + binary DV updates
(reference Lucene54 doc_values consumer strategies and
doc_values_update.rs binary updates)."""

import numpy as np

import rucene_tpu as rt
from rucene_tpu.codec.dv_codec import (
    decode_binary,
    decode_numeric,
    encode_binary,
    encode_numeric,
)
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.store.directory import FSDirectory


def _roundtrip_numeric(vals):
    meta, arrays = encode_numeric(np.asarray(vals, np.int64))
    out = decode_numeric(meta, arrays)
    np.testing.assert_array_equal(out, np.asarray(vals, np.int64))
    return meta


def test_numeric_modes():
    assert _roundtrip_numeric([7] * 100)["mode"] == "const"
    assert _roundtrip_numeric([1, 5, 9] * 50)["mode"] == "table"
    rng = np.random.default_rng(0)
    assert (
        _roundtrip_numeric(rng.integers(0, 10**6, 1000) * 1000 + 5)["mode"] == "gcd"
    )
    big = rng.integers(-(2**62), 2**62, 500)
    _roundtrip_numeric(big)  # raw or gcd, must round-trip
    _roundtrip_numeric([])


def test_numeric_table_shrinks():
    vals = np.asarray([10, 20, 30] * 10000, np.int64)
    meta, arrays = encode_numeric(vals)
    assert meta["mode"] == "table"
    enc_bytes = sum(a.nbytes for a in arrays.values())
    assert enc_bytes * 4 <= vals.nbytes  # >=4x smaller than raw i64


def test_binary_roundtrip_and_shrink():
    per_doc = []
    for i in range(5000):
        if i % 7 == 3:
            per_doc.append(None)
        else:
            per_doc.append(f"category/shared/prefix/{i % 5}".encode())
    meta, arrays = encode_binary(per_doc)
    assert decode_binary(meta, arrays) == per_doc
    raw_bytes = sum(len(v) for v in per_doc if v) + 8 * len(per_doc)
    enc_bytes = sum(a.nbytes for a in arrays.values())
    assert enc_bytes * 4 <= raw_bytes


def test_binary_edge_cases():
    for case in ([], [None, None], [b"", None, b""], [b"abc"], [None, b"x" * 1000]):
        meta, arrays = encode_binary(case)
        assert decode_binary(meta, arrays) == case


def _build_index(tmp_path, n=300):
    w = IndexWriter(FSDirectory(tmp_path), IndexWriterConfig())
    for i in range(n):
        d = rt.Document()
        d.add(rt.TextField("body", f"doc{i} common k{i % 3}"))
        d.add(rt.NumericDocValuesField("rank", i % 5))
        d.add(rt.BinaryDocValuesField("blob", f"val/{i % 4}".encode()))
        w.add_document(d)
    w.commit()
    return w


def test_dv_survive_compressed_file_roundtrip(tmp_path):
    w = _build_index(tmp_path)
    w.close()
    from rucene_tpu.index.reader import open_directory_reader

    r = open_directory_reader(FSDirectory(tmp_path))
    leaf = r.leaves[0]
    vals, present = leaf.numeric_doc_values("rank")
    assert present.all()
    np.testing.assert_array_equal(vals, np.arange(leaf.max_doc) % 5)
    col = leaf.binary_doc_values("blob")
    assert col[17] == b"val/1"
    assert col[0] == b"val/0"


def test_update_binary_doc_value(tmp_path):
    w = _build_index(tmp_path)
    w.update_binary_doc_value(rt.Term("body", "doc5"), "blob", b"PATCHED")
    r = w.get_reader()
    col = r.leaves[0].binary_doc_values("blob")
    assert col[5] == b"PATCHED"
    assert col[6] == f"val/{6 % 4}".encode()
    # persists across commit + reopen
    w.commit()
    w.close()
    from rucene_tpu.index.reader import open_directory_reader

    r2 = open_directory_reader(FSDirectory(tmp_path))
    col2 = r2.leaves[0].binary_doc_values("blob")
    assert col2[5] == b"PATCHED"


def test_binary_update_survives_merge(tmp_path):
    w = _build_index(tmp_path, n=120)
    w.update_binary_doc_value(rt.Term("body", "doc7"), "blob", b"MERGED-IN")
    # force another segment then merge everything
    for i in range(120, 160):
        d = rt.Document()
        d.add(rt.TextField("body", f"doc{i} common"))
        d.add(rt.BinaryDocValuesField("blob", b"late"))
        w.add_document(d)
    w.commit()
    w.force_merge(1)
    w.commit()
    r = w.get_reader()
    assert len(r.leaves) == 1
    col = r.leaves[0].binary_doc_values("blob")
    # find doc7 by search (merge may renumber)
    s = rt.IndexSearcher(r)
    td = s.search(rt.TermQuery(rt.Term("body", "doc7")), k=1)
    assert td.total_hits == 1
    assert col[td.score_docs[0].doc] == b"MERGED-IN"
    w.close()


def test_numeric_update_still_works(tmp_path):
    w = _build_index(tmp_path, n=60)
    w.update_numeric_doc_value(rt.Term("body", "doc9"), "rank", 777)
    r = w.get_reader()
    vals, present = r.leaves[0].numeric_doc_values("rank")
    assert vals[9] == 777 and present[9]
    w.close()
