"""IndexWriter lifecycle: flush, two-phase commit, reopen, NRT, deletes,
update, rollback, merge, file GC, corruption detection."""

import pytest

from rucene_tpu import Document, IndexSearcher, StringField, Term, TermQuery, TextField
from rucene_tpu.codec.files import SEGMENTS_PREFIX
from rucene_tpu.index.merge import TieredMergePolicy
from rucene_tpu.index.reader import open_directory_reader
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.search.search_manager import SearcherManager
from rucene_tpu.store.directory import CorruptIndexError, FSDirectory, RAMDirectory, check_footer


def _doc(i: int, text: str) -> Document:
    d = Document()
    d.add(StringField("id", str(i), stored=True))
    d.add(TextField("body", text))
    return d


def test_store_roundtrip(tmp_path):
    d = FSDirectory(str(tmp_path / "idx"))
    out = d.create_output("x.bin")
    out.write_header("x.bin")
    out.write(b"hello world payload")
    out.write_footer()
    out.close()
    assert check_footer(d.read_file("x.bin"), "x.bin") == b"hello world payload"
    # corruption detected
    raw = bytearray(d.read_file("x.bin"))
    raw[15] ^= 0xFF
    with pytest.raises(CorruptIndexError):
        check_footer(bytes(raw), "x.bin")


def test_commit_and_reopen(tmp_path):
    d = FSDirectory(str(tmp_path / "idx"))
    with IndexWriter(d) as w:
        for i, t in enumerate(["fox jumps", "lazy dog", "fox fox dog"]):
            w.add_document(_doc(i, t))
        w.commit()
    # fresh process: open from disk
    reader = open_directory_reader(d)
    assert reader.num_docs == 3
    s = IndexSearcher(reader)
    td = s.search(TermQuery(Term("body", "fox")), k=10)
    assert td.total_hits == 2
    assert s.reader.document(td.score_docs[0].doc)["id"] in {"0", "2"}


def test_two_phase_commit_files(tmp_path):
    d = FSDirectory(str(tmp_path / "idx"))
    w = IndexWriter(d)
    w.add_document(_doc(0, "hello world"))
    w.commit()
    names = d.list_all()
    assert any(n.startswith(SEGMENTS_PREFIX) for n in names)
    assert not any(n.startswith("pending_") for n in names)
    w.add_document(_doc(1, "second commit"))
    w.commit()
    gens = sorted(n for n in d.list_all() if n.startswith(SEGMENTS_PREFIX))
    assert len(gens) == 1  # KeepOnlyLastCommit pruned the old generation
    w.close()


def test_nrt_reader_and_manager(tmp_path):
    d = RAMDirectory()
    w = IndexWriter(d)
    w.add_document(_doc(0, "alpha beta"))
    mgr = SearcherManager(w)
    s0 = mgr.acquire()
    assert s0.search(TermQuery(Term("body", "alpha")), 5).total_hits == 1
    # new doc not visible until refresh
    w.add_document(_doc(1, "alpha gamma"))
    assert mgr.acquire().search(TermQuery(Term("body", "alpha")), 5).total_hits == 1
    assert mgr.maybe_refresh() is True
    assert mgr.acquire().search(TermQuery(Term("body", "alpha")), 5).total_hits == 2
    assert mgr.maybe_refresh() is False  # nothing changed
    w.close()


def test_delete_and_update(tmp_path):
    d = RAMDirectory()
    w = IndexWriter(d)
    for i, t in enumerate(["fox one", "fox two", "dog three"]):
        w.add_document(_doc(i, t))
    w.delete_documents_by_term(Term("id", "0"))
    r = w.get_reader()
    assert r.num_docs == 2
    s = IndexSearcher(r)
    assert s.search(TermQuery(Term("body", "fox")), 5).total_hits == 1

    # update = delete + add
    w.update_document(Term("id", "1"), _doc(1, "cat two"))
    s2 = IndexSearcher(w.get_reader())
    assert s2.search(TermQuery(Term("body", "fox")), 5).total_hits == 0
    assert s2.search(TermQuery(Term("body", "cat")), 5).total_hits == 1
    assert s2.search(TermQuery(Term("body", "dog")), 5).total_hits == 1

    # delete only affects docs added before it
    w.delete_documents_by_term(Term("body", "bird"))
    w.add_document(_doc(9, "bird nine"))
    s3 = IndexSearcher(w.get_reader())
    assert s3.search(TermQuery(Term("body", "bird")), 5).total_hits == 1
    w.close()


def test_delete_by_query(tmp_path):
    """delete_documents_by_query: boolean and range queries, watermark
    semantics (docs added after the delete survive), commit persistence."""
    from rucene_tpu import BooleanQuery, IntPoint, PointRangeQuery

    d = FSDirectory(str(tmp_path / "dbq"))
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=4))
    for i in range(10):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", f"tok{i} {'hot' if i % 2 == 0 else 'cold'}"))
        doc.add(IntPoint("year", 2000 + i))
        w.add_document(doc)
    # range delete: years 2003..2005 -> docs 3,4,5
    w.delete_documents_by_query(PointRangeQuery("year", 2003, 2005))
    r = w.get_reader()
    assert r.num_docs == 7
    s = IndexSearcher(r)
    assert s.search(TermQuery(Term("body", "tok4")), 5).total_hits == 0
    assert s.search(TermQuery(Term("body", "tok6")), 5).total_hits == 1

    # boolean delete + watermark: doc added after must survive
    w.delete_documents_by_query(
        BooleanQuery().must(TermQuery(Term("body", "hot"))).must(TermQuery(Term("body", "tok0")))
    )
    late = Document()
    late.add(StringField("id", "99", stored=True))
    late.add(TextField("body", "tok0 hot late"))
    w.add_document(late)
    r2 = w.get_reader()
    s2 = IndexSearcher(r2)
    assert s2.search(TermQuery(Term("body", "tok0")), 5).total_hits == 1  # only the late doc
    assert w.num_deleted_docs() >= 0
    assert w.has_uncommitted_changes()
    w.commit()
    w.close()
    r3 = open_directory_reader(d)
    assert r3.num_docs == 7  # 10 - 3 (range) - 1 (bool) + 1 (late)
    assert IndexSearcher(r3).search(TermQuery(Term("body", "tok4")), 5).total_hits == 0


def test_deletes_survive_commit_reopen(tmp_path):
    d = FSDirectory(str(tmp_path / "idx"))
    w = IndexWriter(d)
    for i in range(5):
        w.add_document(_doc(i, f"term{i} common"))
    w.commit()
    w.delete_documents_by_term(Term("id", "2"))
    w.commit()
    w.close()
    r = open_directory_reader(d)
    assert r.num_docs == 4
    s = IndexSearcher(r)
    assert s.search(TermQuery(Term("body", "common")), 10).total_hits == 4
    assert s.search(TermQuery(Term("body", "term2")), 10).total_hits == 0


def test_rollback(tmp_path):
    d = RAMDirectory()
    w = IndexWriter(d)
    w.add_document(_doc(0, "committed doc"))
    w.commit()
    w.add_document(_doc(1, "uncommitted doc"))
    w.rollback()
    assert IndexSearcher(w.get_reader()).search(TermQuery(Term("body", "doc")), 5).total_hits == 1
    w.close()


def test_force_merge(tmp_path):
    d = RAMDirectory()
    cfg = IndexWriterConfig(max_buffered_docs=2)
    w = IndexWriter(d, cfg)
    texts = [f"word{i} shared fox" if i % 2 == 0 else f"word{i} shared" for i in range(10)]
    for i, t in enumerate(texts):
        w.add_document(_doc(i, t))
    w.delete_documents_by_term(Term("id", "4"))
    r0 = w.get_reader()
    assert len(r0.leaves) == 5
    before = IndexSearcher(r0).search(TermQuery(Term("body", "fox")), 20)
    w.force_merge(1)
    r1 = w.get_reader()
    assert len(r1.leaves) == 1
    assert r1.num_docs == 9
    after = IndexSearcher(r1).search(TermQuery(Term("body", "fox")), 20)
    assert after.total_hits == before.total_hits
    # same surviving doc ids (by stored id), scores may shift as stats change
    ids_before = {IndexSearcher(r0).reader.document(sd.doc)["id"] for sd in before.score_docs}
    ids_after = {r1.document(sd.doc)["id"] for sd in after.score_docs}
    assert ids_before == ids_after
    w.close()


def test_auto_merge_policy(tmp_path):
    d = RAMDirectory()
    cfg = IndexWriterConfig(
        max_buffered_docs=1,
        merge_policy=TieredMergePolicy(merge_factor=4, segs_per_tier=4),
    )
    w = IndexWriter(d, cfg)
    for i in range(12):
        w.add_document(_doc(i, f"common token{i}"))
    w.commit()
    r = w.get_reader()
    assert len(r.leaves) < 12  # merging kicked in
    assert r.num_docs == 12
    assert IndexSearcher(r).search(TermQuery(Term("body", "common")), 20).total_hits == 12
    w.close()


def test_merge_policy_size_cap_and_deletes_reclaim():
    # cap: jumbo segments (> cap/2) are never inputs; candidate trimmed
    p = TieredMergePolicy(merge_factor=4, segs_per_tier=1, max_merged_segment_docs=100)
    sizes = {"_big": 90, "_a": 30, "_b": 30, "_c": 30, "_d": 40}
    cands = p.find_merges(sizes)
    assert len(cands) == 1
    names = cands[0].segments
    assert "_big" not in names
    assert sum(sizes[n] for n in names) <= 100
    assert len(names) >= 2

    # reclaim: high-delete segment selected alone, below tier threshold
    p2 = TieredMergePolicy(merge_factor=10, segs_per_tier=10, deletes_pct_allowed=30.0)
    cands = p2.find_merges({"_x": 50, "_y": 100}, deletes={"_x": 40, "_y": 5})
    assert [c.segments for c in cands] == [["_x"]]


def test_writer_reclaims_deletes_via_policy():
    d = RAMDirectory()
    cfg = IndexWriterConfig(
        max_buffered_docs=10,
        merge_policy=TieredMergePolicy(deletes_pct_allowed=25.0),
    )
    w = IndexWriter(d, cfg)
    for i in range(20):
        w.add_document(_doc(i, f"tok{i} shared"))
    w.commit()
    for i in range(4):  # 40% of the first segment
        w.delete_documents_by_term(Term("id", str(i)))
    w.commit()  # merge_on_commit: reclaim fires right here
    assert all(i.del_count == 0 for i in w._infos.segments)
    r = w.get_reader()
    assert r.num_docs == 16
    assert IndexSearcher(r).search(TermQuery(Term("body", "shared")), 20).total_hits == 16
    w.close()


def test_merged_scores_match_unmerged(tmp_path):
    """Merging must not change scores when nothing is deleted."""
    d1, d2 = RAMDirectory(), RAMDirectory()
    texts = [f"fox alpha{i % 3} beta{i % 5} fox" for i in range(40)]
    w1 = IndexWriter(d1, IndexWriterConfig(max_buffered_docs=7))
    w2 = IndexWriter(d2, IndexWriterConfig(max_buffered_docs=1000))
    for i, t in enumerate(texts):
        w1.add_document(_doc(i, t))
        w2.add_document(_doc(i, t))
    w1.force_merge(1)
    ra, rb = w1.get_reader(), w2.get_reader()
    sa, sb = IndexSearcher(ra), IndexSearcher(rb)
    ta = sa.search(TermQuery(Term("body", "fox")), 40)
    tb = sb.search(TermQuery(Term("body", "fox")), 40)
    assert [(sd.doc, sd.score) for sd in ta.score_docs] == [
        (sd.doc, sd.score) for sd in tb.score_docs
    ]
    w1.close()
    w2.close()


def test_write_lock_excludes_second_writer(tmp_path):
    from rucene_tpu.store.directory import LockObtainFailedError

    d = FSDirectory(str(tmp_path / "lk"))
    w1 = IndexWriter(d)
    with pytest.raises(LockObtainFailedError):
        IndexWriter(d)
    w1.close()
    # released on close: a new writer can open
    w2 = IndexWriter(d)
    w2.close()
    # RAMDirectory too
    rd = RAMDirectory()
    a = IndexWriter(rd)
    with pytest.raises(LockObtainFailedError):
        IndexWriter(rd)
    a.close()


def test_crashed_writer_does_not_wedge_lock(tmp_path):
    """flock locking: a leftover write.lock FILE from a dead writer never
    blocks (the kernel dropped the flock with the process); a live flock
    holder in another process excludes; release keeps the file but drops
    the flock."""
    import subprocess
    import sys

    from rucene_tpu.store.directory import LockObtainFailedError

    d = FSDirectory(str(tmp_path / "crash"))
    # simulate a crashed writer: the lock FILE exists (with a dead pid in
    # it) but no process holds the flock
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(d._p("write.lock"), "w") as f:
        f.write(str(proc.pid))
    w = IndexWriter(d)  # acquires immediately — no flock is held
    w.add_document(_doc(0, "alive again"))
    w.commit()
    w.close()
    # release keeps the file (never unlinked: avoids inode-swap races)
    assert d.file_exists("write.lock")
    # ... and a new writer can acquire it again
    IndexWriter(d).close()

    # a REAL holder in another OS process excludes until it dies
    holder_src = (
        "import time; "
        "from rucene_tpu.store.directory import FSDirectory; "
        f"FSDirectory({d.path!r}).obtain_lock(); print('LOCKED', flush=True); "
        "time.sleep(60)"
    )
    holder = subprocess.Popen(
        [sys.executable, "-c", holder_src],
        stdout=subprocess.PIPE,
        text=True,
        cwd="/root/repo",
    )
    try:
        assert holder.stdout.readline().strip() == "LOCKED"
        with pytest.raises(LockObtainFailedError):
            IndexWriter(d)
        holder.kill()
        holder.wait()
        # holder died without release(): kernel dropped the flock
        IndexWriter(d).close()
    finally:
        if holder.poll() is None:
            holder.kill()
            holder.wait()


def test_max_merged_segment_mb_cap(tmp_path):
    """Byte-size merge cap (reference merge_policy.rs:455): oversized
    segments are never merge inputs; candidates trim to fit."""
    from rucene_tpu.index.merge import TieredMergePolicy

    mp = TieredMergePolicy(
        merge_factor=4, segs_per_tier=1, max_merged_segment_mb=1.0
    )
    kb = 1024
    sizes = {f"s{i}": 100 for i in range(5)}
    # s4 alone exceeds half the 1MB cap -> excluded from the pool
    byte_sizes = {"s0": 100 * kb, "s1": 200 * kb, "s2": 300 * kb,
                  "s3": 300 * kb, "s4": 600 * kb}
    out = mp.find_merges(sizes, byte_sizes=byte_sizes)
    assert out, "expected a merge candidate"
    cand = out[0].segments
    assert "s4" not in cand
    assert sum(byte_sizes[n] for n in cand) <= 1024 * kb
    # no byte_sizes provided -> cap is inert, doc-count logic unchanged
    out2 = mp.find_merges(sizes)
    assert out2 and len(out2[0].segments) == 4


def test_block_add_contiguity_and_nrt_current(tmp_path):
    """add_documents is an atomic block (contiguous ids in ONE segment,
    index_writer.rs:436); nrt_is_current tracks content generations."""
    import rucene_tpu as rt
    from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
    from rucene_tpu.store.directory import FSDirectory

    d = FSDirectory(str(tmp_path))
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=4))
    # 3 singles (1 away from flush) then a block of 6: the block must NOT
    # split across the flush boundary
    for i in range(3):
        doc = rt.Document()
        doc.add(rt.StringField("id", f"s{i}", stored=True))
        doc.add(rt.TextField("body", "single"))
        w.add_document(doc)
    block = []
    for i in range(6):
        doc = rt.Document()
        doc.add(rt.StringField("id", f"b{i}", stored=True))
        doc.add(rt.TextField("body", "blocked"))
        block.append(doc)
    w.add_documents(block)
    r = w.get_reader()
    assert w.nrt_is_current(r)
    s = rt.IndexSearcher(r)
    td = s.search(rt.TermQuery(rt.Term("body", "blocked")), k=10)
    docs = sorted(sd.doc for sd in td.score_docs)
    assert docs == list(range(docs[0], docs[0] + 6)), docs  # contiguous
    # one leaf contains all six
    leaf_of = [
        max(lf.doc_base for lf in r.leaves if lf.doc_base <= doc) for doc in docs
    ]
    assert len(set(leaf_of)) == 1

    doc = rt.Document()
    doc.add(rt.StringField("id", "late", stored=True))
    doc.add(rt.TextField("body", "single"))
    w.add_document(doc)
    assert not w.nrt_is_current(r)
    r2 = w.get_reader()
    assert w.nrt_is_current(r2) and not w.nrt_is_current(r)

    # update_documents: atomic replace of the block by key
    blk2 = []
    for i in range(2):
        doc = rt.Document()
        doc.add(rt.StringField("id", f"nb{i}", stored=True))
        doc.add(rt.TextField("body", "reblocked"))
        blk2.append(doc)
    w.update_documents(rt.Term("body", "blocked"), blk2)
    r3 = w.get_reader()
    s3 = rt.IndexSearcher(r3)
    assert s3.search(rt.TermQuery(rt.Term("body", "blocked")), k=10).total_hits == 0
    assert s3.search(rt.TermQuery(rt.Term("body", "reblocked")), k=10).total_hits == 2
    w.close()
