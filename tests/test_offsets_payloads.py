"""Postings offsets + payloads: IndexOptions ..._AND_OFFSETS fields carry
char offsets in the postings (not just term vectors); pre-analyzed
list[Token] fields carry per-occurrence payloads (reference
posting_writer.rs offsets/payload planes; field-with-TokenStream path
field.rs:202). Covers buffer->pack->read, disk roundtrip, and merge."""

import numpy as np

from rucene_tpu import (
    Document,
    IndexSearcher,
    StringField,
    Term,
    TermQuery,
    TextField,
    Token,
)
from rucene_tpu.index.reader import open_directory_reader
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.store.directory import RAMDirectory


def _expected_spans(texts, term):
    """(doc_order) char spans of `term` across texts, whitespace tokens."""
    spans = []
    for t in texts:
        i = 0
        for w in t.split():
            start = t.index(w, i)
            i = start + len(w)
            if w == term:
                spans.append((start, i))
    return spans


def test_offsets_roundtrip_and_reopen():
    texts = ["the fox and the ox", "fox fox jumps", "a lazy dog"]
    d = RAMDirectory()
    w = IndexWriter(d)
    for i, t in enumerate(texts):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", t, offsets=True))
        w.add_document(doc)
    w.commit()

    for r in (w.get_reader(), open_directory_reader(d)):
        leaf = r.leaves[0]
        docs, freqs, positions, offsets, payloads = leaf.read_postings(
            "body", "fox", with_positions=True, with_offsets=True, with_payloads=True
        )
        assert docs.tolist() == [0, 1]
        assert freqs.tolist() == [1, 2]
        got = list(zip(offsets[0].tolist(), offsets[1].tolist()))
        assert got == _expected_spans(texts, "fox")
        assert payloads is None  # no payloads were indexed

        # a term in one doc only
        _, _, _, offs2, _ = leaf.read_postings(
            "body", "lazy", with_offsets=True, with_payloads=True
        )
        assert list(zip(offs2[0].tolist(), offs2[1].tolist())) == _expected_spans(
            texts, "lazy"
        )
    w.close()


def test_offsets_absent_without_option():
    d = RAMDirectory()
    w = IndexWriter(d)
    doc = Document()
    doc.add(TextField("body", "plain field no offsets"))
    w.add_document(doc)
    r = w.get_reader()
    out = r.leaves[0].read_postings("body", "plain", with_offsets=True, with_payloads=True)
    docs, freqs, positions, offsets, payloads = out
    assert offsets is None and payloads is None
    # 3-tuple shape unchanged for plain calls
    assert len(r.leaves[0].read_postings("body", "plain", with_positions=True)) == 3
    w.close()


def test_payloads_via_pre_analyzed_tokens():
    d = RAMDirectory()
    w = IndexWriter(d)
    doc = Document()
    doc.add(
        TextField(
            "body",
            [
                Token("alpha", 0, 0, 5, payload=b"\x01\x02"),
                Token("beta", 1, 6, 10),
                Token("alpha", 2, 11, 16, payload=b"\x7f"),
            ],
            stored=True,
            offsets=True,
        )
    )
    doc.add(StringField("id", "0", stored=True))
    w.add_document(doc)
    w.commit()
    for r in (w.get_reader(), open_directory_reader(d)):
        leaf = r.leaves[0]
        docs, freqs, positions, offsets, payloads = leaf.read_postings(
            "body", "alpha", with_positions=True, with_offsets=True, with_payloads=True
        )
        assert docs.tolist() == [0] and freqs.tolist() == [2]
        assert positions.tolist() == [0, 2]
        assert list(zip(offsets[0].tolist(), offsets[1].tolist())) == [(0, 5), (11, 16)]
        assert payloads == [b"\x01\x02", b"\x7f"]
        # stored reconstructs the token text
        assert r.document(0)["body"] == "alpha beta alpha"
        # searchable like any other field
        assert IndexSearcher(r).search(TermQuery(Term("body", "beta")), 5).total_hits == 1
    w.close()


def test_offsets_survive_merge_with_deletes():
    texts = [f"w{i} fox tail" if i % 2 == 0 else f"w{i} dog tail" for i in range(8)]
    d = RAMDirectory()
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=3))
    for i, t in enumerate(texts):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", t, offsets=True))
        w.add_document(doc)
    w.delete_documents_by_term(Term("id", "2"))
    w.force_merge(1)
    r = w.get_reader()
    assert len(r.leaves) == 1
    leaf = r.leaves[0]
    docs, freqs, _, offsets, _ = leaf.read_postings(
        "body", "fox", with_offsets=True, with_payloads=True
    )
    surviving = [t for i, t in enumerate(texts) if i != 2 and "fox" in t]
    assert freqs.sum() == len(surviving)
    assert list(zip(offsets[0].tolist(), offsets[1].tolist())) == _expected_spans(
        surviving, "fox"
    )
    # 'tail' appears in every doc; spans must follow merged doc order
    _, _, _, offs_t, _ = leaf.read_postings("body", "tail", with_offsets=True)
    alive = [t for i, t in enumerate(texts) if i != 2]
    assert list(zip(offs_t[0].tolist(), offs_t[1].tolist())) == _expected_spans(
        alive, "tail"
    )
    w.close()


def test_multivalued_offsets_accumulate():
    """Offsets of a multi-valued field map onto the space-joined view
    (Lucene's offset-gap behavior); term vectors accumulate the same way."""
    d = RAMDirectory()
    w = IndexWriter(d)
    doc = Document()
    doc.add(TextField("body", "alpha beta", offsets=True))
    doc.add(TextField("body", "gamma beta", offsets=True))
    doc.add(TextField("tvf", "one two", term_vectors=True))
    doc.add(TextField("tvf", "two", term_vectors=True))
    w.add_document(doc)
    leaf = w.get_reader().leaves[0]
    _, _, pos, offs, _ = leaf.read_postings(
        "body", "beta", with_positions=True, with_offsets=True
    )
    joined = "alpha beta gamma beta"
    spans = list(zip(offs[0].tolist(), offs[1].tolist()))
    assert pos.tolist() == [1, 3]
    assert [joined[a:b] for a, b in spans] == ["beta", "beta"]
    assert spans == [(6, 10), (17, 21)]
    tv = leaf.term_vector(0, "tvf")
    assert tv["two"] == [(1, 4, 7), (2, 8, 11)]
    w.close()


def test_multivalued_stored_fields_accumulate():
    """Stored multi-values come back as a list (Document.getValues);
    single values stay scalar."""
    d = RAMDirectory()
    w = IndexWriter(d)
    doc = Document()
    doc.add(TextField("body", "first value", stored=True))
    doc.add(TextField("body", "second value", stored=True))
    doc.add(StringField("id", "7", stored=True))
    w.add_document(doc)
    w.commit()
    for r in (w.get_reader(), open_directory_reader(d)):
        got = r.document(0)
        assert got["body"] == ["first value", "second value"]
        assert got["id"] == "7"
    w.close()


def test_mixed_offset_and_plain_fields():
    """Only the offsets-enabled field pays for the plane; the plain field
    reads back -1-free None offsets."""
    d = RAMDirectory()
    w = IndexWriter(d)
    doc = Document()
    doc.add(TextField("with_off", "alpha beta", offsets=True))
    doc.add(TextField("plain", "alpha beta"))
    w.add_document(doc)
    r = w.get_reader()
    leaf = r.leaves[0]
    _, _, _, offs, _ = leaf.read_postings("with_off", "beta", with_offsets=True)
    assert list(zip(offs[0].tolist(), offs[1].tolist())) == [(6, 10)]
    _, _, _, offs_p, _ = leaf.read_postings("plain", "beta", with_offsets=True)
    # plane exists segment-wide but the plain field's entries are absent
    assert offs_p is None or (np.asarray(offs_p[0]) < 0).all()
    w.close()
