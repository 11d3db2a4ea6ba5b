"""Background merges: off the writer lock, failures surfaced, and updates
that land during a merge carried into the merged segment
(reference merge_scheduler.rs:141-250, index_writer.rs:2722-3465)."""

import threading
import time

import pytest

from rucene_tpu import Document, IndexSearcher, StringField, Term, TermQuery, TextField
from rucene_tpu.index.merge import TieredMergePolicy
from rucene_tpu.index.merge_scheduler import ConcurrentMergeScheduler, SerialMergeScheduler
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.store.directory import RAMDirectory


def _doc(i: int, text: str) -> Document:
    d = Document()
    d.add(TextField("body", text))
    d.add(StringField("id", str(i), stored=True))
    return d


def _gated_merge(monkeypatch, started: threading.Event, release: threading.Event):
    """Patch the writer's merge_segments so the test controls merge timing."""
    import rucene_tpu.index.writer as writer_mod

    real = writer_mod.merge_segments

    def slow(snaps):
        started.set()
        assert release.wait(timeout=30), "test never released the merge"
        return real(snaps)

    monkeypatch.setattr(writer_mod, "merge_segments", slow)


def test_add_document_proceeds_while_merge_runs(tmp_path, monkeypatch):
    started, release = threading.Event(), threading.Event()
    _gated_merge(monkeypatch, started, release)
    cfg = IndexWriterConfig(
        max_buffered_docs=2,
        merge_policy=TieredMergePolicy(merge_factor=2, segs_per_tier=2),
        merge_scheduler=ConcurrentMergeScheduler(max_threads=2),
        merge_on_commit=False,
    )
    w = IndexWriter(RAMDirectory(), cfg)
    for i in range(8):
        w.add_document(_doc(i, f"common word{i}"))
    w.commit()
    w.maybe_merge()
    assert started.wait(timeout=10), "merge never started"
    # the merge thread is mid-merge and must NOT hold the writer lock
    t0 = time.monotonic()
    w.add_document(_doc(100, "common late"))
    w.flush()
    elapsed = time.monotonic() - t0
    assert elapsed < 5.0, f"add_document blocked behind a running merge ({elapsed:.1f}s)"
    release.set()
    cfg.merge_scheduler.sync()
    r = w.get_reader()
    assert r.num_docs == 9
    s = IndexSearcher(r)
    assert s.search(TermQuery(Term("body", "common")), 20).total_hits == 9
    w.close()


def test_failing_merge_surfaces(monkeypatch):
    import rucene_tpu.index.writer as writer_mod

    def boom(snaps):
        raise RuntimeError("merge corrupted")

    monkeypatch.setattr(writer_mod, "merge_segments", boom)
    cfg = IndexWriterConfig(
        max_buffered_docs=2,
        merge_policy=TieredMergePolicy(merge_factor=2, segs_per_tier=2),
        merge_scheduler=ConcurrentMergeScheduler(max_threads=2),
        merge_on_commit=False,
    )
    w = IndexWriter(RAMDirectory(), cfg)
    for i in range(8):
        w.add_document(_doc(i, f"common word{i}"))
    w.commit()
    w.maybe_merge()
    cfg.merge_scheduler.sync()
    assert w.merge_exceptions, "failing merge was swallowed"
    assert "merge corrupted" in str(w.merge_exceptions[0])
    # the writer itself stays usable (merge failures are not tragedies here)
    w.add_document(_doc(100, "still alive"))
    assert w.get_reader().num_docs == 9


def test_failing_serial_merge_propagates(monkeypatch):
    import rucene_tpu.index.writer as writer_mod

    def boom(snaps):
        raise RuntimeError("serial merge boom")

    monkeypatch.setattr(writer_mod, "merge_segments", boom)
    cfg = IndexWriterConfig(
        max_buffered_docs=2,
        merge_policy=TieredMergePolicy(merge_factor=2, segs_per_tier=2),
        merge_scheduler=SerialMergeScheduler(),
        merge_on_commit=False,
    )
    w = IndexWriter(RAMDirectory(), cfg)
    for i in range(8):
        w.add_document(_doc(i, f"common word{i}"))
    w.commit()
    with pytest.raises(RuntimeError, match="serial merge boom"):
        w.maybe_merge()
    assert w.merge_exceptions


def test_deletes_during_merge_are_carried(tmp_path, monkeypatch):
    started, release = threading.Event(), threading.Event()
    _gated_merge(monkeypatch, started, release)
    cfg = IndexWriterConfig(
        max_buffered_docs=2,
        merge_policy=TieredMergePolicy(merge_factor=2, segs_per_tier=2),
        merge_scheduler=ConcurrentMergeScheduler(max_threads=2),
        merge_on_commit=False,
    )
    w = IndexWriter(RAMDirectory(), cfg)
    for i in range(8):
        w.add_document(_doc(i, f"common word{i}"))
    w.commit()
    w.maybe_merge()
    assert started.wait(timeout=10)
    # while the merge runs: delete a doc and update a DV-free doc via term
    w.delete_documents_by_term(Term("id", "3"))
    r_during = w.get_reader()  # applies the delete to the (old) input segments
    assert r_during.num_docs == 7
    release.set()
    cfg.merge_scheduler.sync()
    r = w.get_reader()
    assert r.num_docs == 7, "delete arriving during the merge was lost"
    s = IndexSearcher(r)
    assert s.search(TermQuery(Term("body", "word3")), 5).total_hits == 0
    assert s.search(TermQuery(Term("body", "common")), 20).total_hits == 7
    w.close()


def test_pending_delete_queued_during_merge_survives_swap(monkeypatch):
    """A delete queued (not yet applied) while the merge runs must still
    take effect after the inputs are swapped out."""
    started, release = threading.Event(), threading.Event()
    _gated_merge(monkeypatch, started, release)
    cfg = IndexWriterConfig(
        max_buffered_docs=2,
        merge_policy=TieredMergePolicy(merge_factor=2, segs_per_tier=2),
        merge_scheduler=ConcurrentMergeScheduler(max_threads=2),
        merge_on_commit=False,
    )
    w = IndexWriter(RAMDirectory(), cfg)
    for i in range(8):
        w.add_document(_doc(i, f"common word{i}"))
    w.commit()
    w.maybe_merge()
    assert started.wait(timeout=10)
    w.delete_documents_by_term(Term("id", "5"))  # queued, NOT applied yet
    release.set()
    cfg.merge_scheduler.sync()
    r = w.get_reader()  # applies pending deletes now
    assert r.num_docs == 7, "pending delete lost when its target segments merged away"
    w.close()


def test_binary_dv_updates_during_merge_are_carried(monkeypatch):
    """Binary DV updates that land WHILE a merge runs — both applied (via
    get_reader) and still-pending at swap time — must reach the merged
    segment and survive commit (reference doc_values_update.rs handles
    numeric and binary symmetrically; ADVICE r1 medium: binary landed in
    the numeric overlay and broke commit)."""
    from rucene_tpu import BinaryDocValuesField

    started, release = threading.Event(), threading.Event()
    _gated_merge(monkeypatch, started, release)
    cfg = IndexWriterConfig(
        max_buffered_docs=2,
        merge_policy=TieredMergePolicy(merge_factor=2, segs_per_tier=2),
        merge_scheduler=ConcurrentMergeScheduler(max_threads=2),
        merge_on_commit=False,
    )
    w = IndexWriter(RAMDirectory(), cfg)
    for i in range(8):
        d = _doc(i, f"common word{i}")
        d.add(BinaryDocValuesField("blob", f"orig{i}".encode()))
        w.add_document(d)
    w.commit()
    w.maybe_merge()
    assert started.wait(timeout=10)
    # applied mid-merge (get_reader applies to the old input segments)
    w.update_binary_doc_value(Term("id", "2"), "blob", b"MID-APPLIED")
    w.get_reader()
    # queued, still pending when the swap happens
    w.update_binary_doc_value(Term("id", "6"), "blob", b"MID-PENDING")
    release.set()
    cfg.merge_scheduler.sync()
    w.commit()  # ADVICE bug: int(bytes) TypeError here
    r = w.get_reader()
    s = IndexSearcher(r)

    def blob_of(ident):
        td = s.search(TermQuery(Term("id", ident)), 1)
        assert td.total_hits == 1
        sd = td.score_docs[0]
        for leaf in r.leaves:
            if leaf.doc_base <= sd.doc < leaf.doc_base + leaf.max_doc:
                return leaf.binary_doc_values("blob")[sd.doc - leaf.doc_base]
        raise AssertionError("doc not in any leaf")

    assert blob_of("2") == b"MID-APPLIED"
    assert blob_of("6") == b"MID-PENDING"
    assert blob_of("3") == b"orig3"
    w.close()


def test_merge_result_persists_on_close(monkeypatch):
    """A merge finishing after the final commit still reaches disk."""
    started, release = threading.Event(), threading.Event()
    _gated_merge(monkeypatch, started, release)
    from rucene_tpu.index.reader import open_directory_reader
    from rucene_tpu.store.directory import RAMDirectory as RD

    d = RD()
    cfg = IndexWriterConfig(
        max_buffered_docs=2,
        merge_policy=TieredMergePolicy(merge_factor=2, segs_per_tier=2),
        merge_scheduler=ConcurrentMergeScheduler(max_threads=2),
        merge_on_commit=False,
    )
    w = IndexWriter(d, cfg)
    for i in range(8):
        w.add_document(_doc(i, f"common word{i}"))
    w.commit()
    w.maybe_merge()
    assert started.wait(timeout=10)
    release.set()
    w.close()  # drains the scheduler, re-commits if a merge landed late
    r = open_directory_reader(d)
    assert r.num_docs == 8
    assert len(r.leaves) < 4
