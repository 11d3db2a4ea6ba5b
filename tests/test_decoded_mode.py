"""Decoded-postings residency (codec/device.add_decoded_planes).

The TPU-first inversion of the reference's pack-everything design
(posting_reader.rs re-decodes blocks on every advance): postings live
DECODED in HBM and the hot path is row gathers. These tests pin exact
parity between decoded and packed execution on every query class the
flat executor serves.
"""

from __future__ import annotations

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.hitcheck import assert_hits_equal


def assert_topdocs_equal(a, b):
    assert a.total_hits == b.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in a.score_docs],
        [(sd.doc, sd.score) for sd in b.score_docs],
    )


def _build_reader(texts, n_segments=1):
    bounds = np.linspace(0, len(texts), n_segments + 1).astype(int)
    snaps = []
    for si in range(n_segments):
        buf = SegmentBuffer()
        for t in texts[bounds[si] : bounds[si + 1]]:
            d = rt.Document()
            d.add(rt.TextField("body", t))
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"s{si}", pack_segment(buf.finish())))
    return IndexReader(snaps)


def _texts(n=600, vocab=60, seed=5):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    # skewed: w0 appears in nearly every doc (drives the EF/bitset block
    # regime), the tail is rare
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.3
    probs /= probs.sum()
    return [
        " ".join(rng.choice(words, size=int(rng.integers(4, 24)), p=probs))
        for _ in range(n)
    ]


def _queries():
    qs = []
    for i in range(6):
        q = rt.BooleanQuery()
        q.should(rt.TermQuery(rt.Term("body", f"w{i}")))
        q.should(rt.TermQuery(rt.Term("body", f"w{(i * 7 + 3) % 60}")))
        qs.append(q)
    conj = rt.BooleanQuery()
    conj.must(rt.TermQuery(rt.Term("body", "w0")))
    conj.must(rt.TermQuery(rt.Term("body", "w3")))
    qs.append(conj)
    qs.append(rt.TermQuery(rt.Term("body", "w1")))
    qs.append(
        rt.DisjunctionMaxQuery(
            [rt.TermQuery(rt.Term("body", "w2")), rt.TermQuery(rt.Term("body", "w5"))],
            tie_breaker=0.3,
        )
    )
    qs.append(rt.PrefixQuery("body", "w1"))
    return qs


def _search_both(monkeypatch, texts, queries, k=10, n_segments=1, combine=False,
                 deletes=False):
    out = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("RUCENE_DECODED", mode)
        reader = _build_reader(texts, n_segments)
        if deletes:
            leaves = []
            for lf in reader.leaves:
                live = np.ones(lf.max_doc, bool)
                live[:: 7] = False
                leaves.append(lf.with_deletes(live))
            reader = IndexReader(leaves)
        s = rt.IndexSearcher(reader, combine_segments=combine)
        out[mode] = s.search_batch(queries, k=k)
        dev = reader.leaves[0].device
        if mode == "1" and not combine:
            assert dev.docs_dec is not None and dev.freqs_dec is not None
        if mode == "0":
            assert dev.docs_dec is None
    return out


def test_decoded_parity_flat(monkeypatch):
    res = _search_both(monkeypatch, _texts(), _queries())
    for a, b in zip(res["0"], res["1"]):
        assert_topdocs_equal(a, b)


def test_decoded_parity_with_deletes(monkeypatch):
    res = _search_both(monkeypatch, _texts(), _queries(), deletes=True)
    for a, b in zip(res["0"], res["1"]):
        assert_topdocs_equal(a, b)


def test_decoded_parity_combined_multisegment(monkeypatch):
    from rucene_tpu.index import combined as combined_mod

    combined_mod._VIEW_CACHE.clear()
    res = _search_both(
        monkeypatch, _texts(900), _queries(), n_segments=3, combine=True
    )
    combined_mod._VIEW_CACHE.clear()
    for a, b in zip(res["0"], res["1"]):
        assert_topdocs_equal(a, b)


def test_decoded_covers_ef_blocks(monkeypatch):
    """Docs where one term hits nearly every doc: the packed form uses
    EF/bitset blocks, and decoded mode must reproduce them exactly."""
    from rucene_tpu.util.packing import EF_TAG

    monkeypatch.setenv("RUCENE_DECODED", "1")
    # mostly-consecutive 'common' docs with one huge gap per run: wide
    # max-delta forces FOR wide, EF wins (same recipe as test_ef.py)
    flags = np.zeros(120000, bool)
    flags[:100] = True
    flags[100000:100200] = True
    texts = [("common " if f else "") + f"extra{i % 97}" for i, f in enumerate(flags)]
    reader = _build_reader(texts)
    packed = reader.leaves[0].packed
    assert (packed.blk_doc_bits >= EF_TAG).any(), "corpus failed to trigger EF"
    dev = reader.leaves[0].device
    assert dev.docs_dec is not None

    import jax

    docs = np.asarray(jax.device_get(dev.docs_dec))
    pf = packed.fields["body"]
    o = pf.term_ord["common"]
    got = []
    for b in range(pf.block_start[o], pf.block_start[o] + pf.block_count[o]):
        got.append(docs[b][: packed.blk_count[b]])
    np.testing.assert_array_equal(np.concatenate(got), np.flatnonzero(flags))

    s = rt.IndexSearcher(reader)
    td = s.search(rt.TermQuery(rt.Term("body", "common")), k=5)
    assert td.total_hits == int(flags.sum())


def test_decoded_policy_budget(monkeypatch):
    from rucene_tpu.codec.device import decoded_policy

    monkeypatch.delenv("RUCENE_DECODED", raising=False)
    on, fdt = decoded_policy(1000, 100)
    assert on and fdt == np.uint16 or str(fdt) == "uint16"
    monkeypatch.setenv("RUCENE_DECODED_MAX_MB", "0")
    on, _ = decoded_policy(1000, 100)
    assert not on
    monkeypatch.setenv("RUCENE_DECODED", "1")
    on, fdt = decoded_policy(10**9, 10**6)
    assert on and str(np.dtype(fdt)) == "int32"
