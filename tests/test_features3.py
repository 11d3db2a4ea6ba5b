"""Index sorting, early-terminating sorted search, field collapsing."""

import numpy as np

from rucene_tpu import (
    Document,
    IndexSearcher,
    NumericDocValuesField,
    StringField,
    Term,
    TermQuery,
    TextField,
)
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.search.sort_field import Sort
from rucene_tpu.store.directory import RAMDirectory


def _doc(i, text, rank, group):
    d = Document()
    d.add(StringField("id", str(i), stored=True))
    d.add(TextField("body", text))
    d.add(NumericDocValuesField("rank", rank))
    d.add(NumericDocValuesField("group", group))
    return d


def test_index_sorting():
    d = RAMDirectory()
    cfg = IndexWriterConfig(index_sort=Sort.by("rank"))
    w = IndexWriter(d, cfg)
    ranks = [50, 10, 40, 20, 30]
    for i, r in enumerate(ranks):
        w.add_document(_doc(i, f"common word{i}", r, i % 2))
    w.commit()
    r = w.get_reader()
    leaf = r.leaves[0]
    # docs physically reordered by rank ascending
    vals, _ = leaf.numeric_doc_values("rank")
    assert vals.tolist() == sorted(ranks)
    # stored fields follow the permutation
    assert leaf.document(0)["id"] == "1"  # rank 10 was original doc 1
    # postings remain consistent
    s = IndexSearcher(r)
    assert s.search(TermQuery(Term("body", "common")), 10).total_hits == 5
    assert s.search(TermQuery(Term("body", "word1")), 10).score_docs[0].doc == 0
    w.close()


def test_early_terminated_sorted_search():
    d = RAMDirectory()
    cfg = IndexWriterConfig(index_sort=Sort.by("rank"), max_buffered_docs=8)
    w = IndexWriter(d, cfg)
    rng = np.random.default_rng(11)
    ranks = rng.permutation(32).tolist()
    for i, r in enumerate(ranks):
        w.add_document(_doc(i, "common filler", r, 0))
    r = w.get_reader()
    s = IndexSearcher(r)
    full = s.search_sorted(TermQuery(Term("body", "common")), k=5, sort=Sort.by("rank"))
    early = s.search_sorted_early_terminated(
        TermQuery(Term("body", "common")), k=5, sort=Sort.by("rank"), per_leaf_limit=6
    )
    # index is rank-sorted per segment, so the first 6 docs of each leaf
    # contain each leaf's best 6 -> global top-5 identical
    assert [fd.fields[0] for fd in early.field_docs] == [fd.fields[0] for fd in full.field_docs]
    assert early.total_hits <= full.total_hits  # lower bound
    w.close()


def test_collapse():
    d = RAMDirectory()
    w = IndexWriter(d)
    # 3 groups; scores driven by tf of 'fox'
    corpus = [
        ("fox", 0), ("fox fox", 0), ("fox fox fox pad pad", 1),
        ("fox pad", 1), ("fox", 2),
    ]
    for i, (t, g) in enumerate(corpus):
        w.add_document(_doc(i, t, i, g))
    s = IndexSearcher(w.get_reader())
    td = s.search_collapse(TermQuery(Term("body", "fox")), k=10, collapse_field="group")
    assert td.total_hits == 5
    assert len(td.score_docs) == 3  # one per group
    groups_seen = set()
    r = s.reader
    for sd in td.score_docs:
        leaf = r.leaves[0]
        g = int(leaf.numeric_doc_values("group")[0][sd.doc])
        assert g not in groups_seen
        groups_seen.add(g)
    # each group's winner beats the other member
    plain = s.search(TermQuery(Term("body", "fox")), k=10)
    best_by_group = {}
    for sd in plain.score_docs:
        g = int(r.leaves[0].numeric_doc_values("group")[0][sd.doc])
        if g not in best_by_group:
            best_by_group[g] = sd
    for sd in td.score_docs:
        g = int(r.leaves[0].numeric_doc_values("group")[0][sd.doc])
        assert sd.doc == best_by_group[g].doc
    w.close()


def test_index_lookup():
    from rucene_tpu import TextField as TF
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.index_lookup import LeafIndexLookup
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import SegmentSnapshot

    buf = SegmentBuffer()
    for t in ["alpha beta alpha", "beta gamma", "alpha"]:
        d = Document()
        d.add(TF("body", t, stored=True, term_vectors=True))
        buf.add_document(d)
    leaf = SegmentSnapshot("il", pack_segment(buf.finish()))
    lookup = LeafIndexLookup(leaf)
    t = lookup["body"]["alpha"]
    assert t.df == 2 and t.ttf == 3
    assert t.tf(0) == 2 and t.tf(1) == 0 and t.tf(2) == 1
    ps = t.positions(0)
    assert [p.position for p in ps] == [0, 2]
    assert ps[0].start_offset == 0 and ps[0].end_offset == 5
    assert lookup.field_statistics("body").doc_count == 3


def test_index_lookup_payloads():
    """TermPosition carries inline-postings offsets and payloads, and the
    PayloadHelper decodes work (the reference stubs these with
    unimplemented!(), index_lookup.rs:48-70)."""
    import struct

    from rucene_tpu import TextField as TF
    from rucene_tpu import Token
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.index_lookup import LeafIndexLookup
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import SegmentSnapshot

    buf = SegmentBuffer()
    d = Document()
    d.add(
        TF(
            "body",
            [
                Token("w", 0, 0, 1, payload=struct.pack(">i", 42)),
                Token("w", 1, 2, 3, payload=struct.pack(">f", 2.5)),
                Token("w", 2, 4, 5),
            ],
            offsets=True,
        )
    )
    buf.add_document(d)
    leaf = SegmentSnapshot("pl", pack_segment(buf.finish()))
    ps = LeafIndexLookup(leaf)["body"]["w"].positions(0)
    assert [p.position for p in ps] == [0, 1, 2]
    assert (ps[0].start_offset, ps[0].end_offset) == (0, 1)
    assert ps[0].payload_as_int() == 42
    assert abs(ps[1].payload_as_float() - 2.5) < 1e-6
    assert ps[2].payload is None and ps[2].payload_as_int(default=-7) == -7


def test_unordered_span_near_matches_product_semantics():
    """The pairwise window enumeration equals the (exponential) combo
    product it replaced, without blowing up on high-frequency docs."""
    import itertools

    import numpy as np

    from rucene_tpu.search.spans import SpanNearQuery, SpanTermQuery
    from rucene_tpu.doc.term import Term

    rng = np.random.default_rng(7)

    def brute(subs, min_width, slop):
        out = set()
        for combo in itertools.product(*[range(len(s)) for s in subs]):
            ivs = [subs[j][c] for j, c in enumerate(combo)]
            start = min(int(v[0]) for v in ivs)
            end = max(int(v[1]) for v in ivs)
            if (end - start) - min_width <= slop:
                out.add((start, end))
        return out

    q = SpanNearQuery(
        [SpanTermQuery(Term("f", "a")), SpanTermQuery(Term("f", "b")),
         SpanTermQuery(Term("f", "c"))],
        slop=4, in_order=False,
    )

    class FakeSub:
        def __init__(self, spans):
            self._s = spans

        def spans_for_doc(self, cache, leaf, d):
            return self._s

        def min_width(self):
            return 1

    for trial in range(30):
        subs = []
        for _ in range(3):
            n = int(rng.integers(1, 7))
            p = np.sort(rng.choice(30, n, replace=False))
            subs.append(np.stack([p, p + 1], axis=1).astype(np.int64))
        q.clauses = [FakeSub(s) for s in subs]
        got = q.spans_for_doc({}, None, 0)
        want = brute(subs, 3, 4)
        assert set(map(tuple, got.tolist())) == want, f"trial {trial}"
