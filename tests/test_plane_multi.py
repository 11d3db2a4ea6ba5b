"""Batched plane fetch / prewarm / admission serving layer
(search/phrase_path._phrase_planes_for_many, prewarm_phrase_planes):

- bit parity: the batched fetch == direct single-term builds;
- half-width (words=2) planes equal the low words of full-width ones;
- the serving path returns hit parity with the host oracle;
- prewarm moves every build off the serving path (0 builds at search).

reference: ExactPhraseScorer's per-term postings walk
(src/core/search/scorer/phrase_scorer.rs:122) has no build phase at all —
planes are the TPU-shaped replacement and their build cost must not sit
on the query path (VERDICT r4 item 2a).
"""

import numpy as np

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.searcher import IndexSearcher
from rucene_tpu.util import next_pow2
from rucene_tpu.util.metrics import METRICS
from tests.hitcheck import assert_hits_equal


def _searcher(texts):
    buf = SegmentBuffer()
    for t in texts:
        d = rt.Document()
        d.add(rt.TextField("body", t))
        buf.add_document(d)
    reader = IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])
    return IndexSearcher(reader)


def _corpus(n=3000, vocab=40, seed=7):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    out = []
    for _ in range(n):
        k = int(rng.integers(3, 40))
        out.append(" ".join(rng.choice(words, size=k)))
    return out


def test_multi_build_bit_parity_with_singles():
    import jax.numpy as jnp

    from rucene_tpu.ops.phrase_plane import build_position_plane

    s = _searcher(_corpus())
    leaf = s.reader.leaves[0]
    dev = leaf.device
    terms = ["w0", "w3", "w17", "w39", "w8"]
    p_words = s._plane_words(leaf, "body")
    assert p_words == 2  # docs are <= 40 tokens: half-width planes engage

    singles = []
    for t in terms:
        rec = leaf.term_record("body", t)
        blocks = np.arange(
            rec.block_start, rec.block_start + rec.block_count, dtype=np.int32
        )
        w_pad = next_pow2(max(len(blocks), 1), 8)
        wb = np.zeros(w_pad, np.int32)
        wv = np.zeros(w_pad, bool)
        wb[: len(blocks)] = blocks
        wv[: len(blocks)] = True
        from rucene_tpu.search.searcher import work_has_ef

        p, o = build_position_plane(
            dev, jnp.asarray(wb), jnp.asarray(wv),
            jnp.asarray(np.int32(rec.pos_width)),
            jnp.asarray(np.int32(rec.pos_word_start)),
            has_ef=work_has_ef(leaf.packed.blk_doc_bits, wb, wv, dev=dev),
            words=p_words,
        )
        singles.append((np.asarray(p), np.asarray(o)))

    got = s._phrase_planes_for_many(leaf, [("body", t) for t in terms])
    for t, (p, o) in zip(terms, singles):
        gp, go = got[("body", t)]
        assert (np.asarray(gp) == p).all(), f"plane mismatch {t}"
        assert (np.asarray(go) == o).all(), f"overflow mismatch {t}"


def test_half_width_plane_equals_low_words_of_full():
    """words=2 planes are exactly the low 2 words of words=4 planes (docs
    all fit 64 positions here, so no overflow either way)."""
    import jax.numpy as jnp

    from rucene_tpu.ops.phrase_plane import build_position_plane

    s = _searcher(_corpus(seed=31))
    leaf = s.reader.leaves[0]
    rec = leaf.term_record("body", "w2")
    blocks = np.arange(
        rec.block_start, rec.block_start + rec.block_count, dtype=np.int32
    )
    w_pad = next_pow2(max(len(blocks), 1), 8)
    wb = np.zeros(w_pad, np.int32)
    wv = np.zeros(w_pad, bool)
    wb[: len(blocks)] = blocks
    wv[: len(blocks)] = True
    args = (
        leaf.device, jnp.asarray(wb), jnp.asarray(wv),
        jnp.asarray(np.int32(rec.pos_width)),
        jnp.asarray(np.int32(rec.pos_word_start)),
    )
    p2, o2 = build_position_plane(*args, words=2)
    p4, o4 = build_position_plane(*args, words=4)
    assert (np.asarray(p2) == np.asarray(p4)[:, :2]).all()
    assert not np.asarray(p4)[:, 2:].any()
    assert not np.asarray(o2).any() and not np.asarray(o4).any()


def test_batched_fetch_mixes_cached_absent_and_fresh():
    s = _searcher(_corpus(seed=11))
    leaf = s.reader.leaves[0]
    # prime one term through the single-term path
    single = s._phrase_plane_for(leaf, "body", "w5")
    got = s._phrase_planes_for_many(
        leaf, [("body", "w5"), ("body", "nosuchterm"), ("body", "w9")]
    )
    assert got[("body", "nosuchterm")] is None
    assert got[("body", "w5")][0] is single[0]  # cache hit, same array
    assert got[("body", "w9")] is not None


def test_prewarm_takes_builds_off_the_serving_path():
    from rucene_tpu.search import phrase_path

    texts = _corpus(n=2500, vocab=20, seed=23)
    s = _searcher(texts)
    s.PHRASE_PLANE_MIN_DOCS = 1  # corpus is tiny; engage the plane path
    s.PHRASE_SCALAR_MAX_DOCS = 0
    s.PHRASE_ROW_DF_BUDGET = 0  # force heavy classification -> planes
    n = s.prewarm_phrase_planes("body", min_blocks=1)
    assert n > 0
    before = METRICS.snapshot()["counters"].get("search.phrase_plane_build", 0)
    queries = [
        rt.PhraseQuery("body", ["w1", "w2"]),
        rt.PhraseQuery("body", ["w0", "w1", "w3"]),
        rt.PhraseQuery("body", ["w2", "w2"]),
    ]
    got = s.search_batch(queries, k=12)
    after = METRICS.snapshot()["counters"].get("search.phrase_plane_build", 0)
    assert after == before, "prewarmed search should build no planes"
    from rucene_tpu.search import host_engine

    for q, g in zip(queries, got):
        doc_freqs, stats = s._gather_stats_query(q)
        per_leaf = []
        for leaf in s.reader.leaves:
            m, acc = host_engine.evaluate_query(
                leaf, q, s.similarity, stats, doc_freqs
            )
            hh = host_engine.hits_from_dense(leaf, m, acc, k=12)
            per_leaf.append((leaf.doc_base, hh.docs, hh.scores, hh.total_hits))
        want = s._merge_leaf_hits(per_leaf, 12)
        assert g.total_hits == want.total_hits, q.terms
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )
