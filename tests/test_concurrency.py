"""Concurrency: parallel ingestion (DWPT analog) and concurrent
commit + NRT search (BASELINE config 4: real-time path)."""

import threading
import time

import numpy as np

from rucene_tpu import Document, IndexSearcher, StringField, Term, TermQuery, TextField
from rucene_tpu.index.doc_writer import add_documents_parallel
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.search.search_manager import SearcherManager
from rucene_tpu.store.directory import RAMDirectory
from tests.conftest import random_corpus


def _docs(texts, start=0):
    out = []
    for i, t in enumerate(texts):
        d = Document()
        d.add(StringField("id", str(start + i), stored=True))
        d.add(TextField("body", t))
        out.append(d)
    return out


def test_parallel_ingestion_matches_serial():
    texts = random_corpus(np.random.default_rng(71), 1200)
    w1 = IndexWriter(RAMDirectory())
    add_documents_parallel(w1, _docs(texts), num_threads=4, docs_per_segment=200)
    w2 = IndexWriter(RAMDirectory())
    for d in _docs(texts):
        w2.add_document(d)
    r1, r2 = w1.get_reader(), w2.get_reader()
    assert r1.num_docs == r2.num_docs == 1200
    s1, s2 = IndexSearcher(r1), IndexSearcher(r2)
    for term in ["the", "fox", "engine", "pack"]:
        a = s1.search(TermQuery(Term("body", term)), k=2000)
        b = s2.search(TermQuery(Term("body", term)), k=2000)
        assert a.total_hits == b.total_hits, term
        # same stored ids (global doc order differs across threads)
        ids_a = {r1.document(sd.doc)["id"] for sd in a.score_docs}
        ids_b = {r2.document(sd.doc)["id"] for sd in b.score_docs}
        assert ids_a == ids_b, term
    w1.close()
    w2.close()


def test_concurrent_commit_and_search():
    """Writer thread committing while a searcher thread runs NRT queries:
    searchers must always see a consistent point-in-time snapshot."""
    w = IndexWriter(RAMDirectory(), IndexWriterConfig(max_buffered_docs=50))
    texts = random_corpus(np.random.default_rng(72), 600)
    mgr = SearcherManager(w)
    errors: list[BaseException] = []
    stop = threading.Event()

    def writer_thread():
        try:
            for i, d in enumerate(_docs(texts)):
                w.add_document(d)
                if i % 150 == 149:
                    w.commit()
            w.commit()
        except BaseException as e:
            errors.append(e)
        finally:
            stop.set()

    observed = []

    def search_thread():
        try:
            while not stop.is_set():
                mgr.maybe_refresh()
                s = mgr.acquire()
                td = s.search(TermQuery(Term("body", "the")), k=5)
                observed.append(td.total_hits)
                time.sleep(0.01)
        except BaseException as e:
            errors.append(e)

    wt = threading.Thread(target=writer_thread)
    st = threading.Thread(target=search_thread)
    wt.start(); st.start()
    wt.join(); stop.set(); st.join()
    assert not errors, errors
    # hit counts only ever grow (snapshots are point-in-time consistent)
    assert observed == sorted(observed)
    mgr.maybe_refresh()
    final = mgr.acquire().search(TermQuery(Term("body", "the")), k=5)
    ref = IndexSearcher(w.get_reader()).search(TermQuery(Term("body", "the")), k=5)
    assert final.total_hits == ref.total_hits
    w.close()
