"""rucene_tpu — a TPU-native full-text search framework.

Capability target: zhihu/rucene (Apache Lucene 6.2.1 semantics) — inverted
indexing with segments and two-phase commits, BM25 boolean/term/phrase/range
search with top-k collection, NRT refresh, deletes, merging, doc values,
stored fields and highlighting — re-architected for TPU: postings are
bit-packed block tensors decoded on-device, matching and scoring run as
batched dense XLA/Pallas programs, segments shard across a device mesh.

See SURVEY.md for the reference blueprint and docs/ARCHITECTURE.md for the
design.
"""

__version__ = "0.1.0"

import os as _os

if _os.name == "posix" and _os.environ.get("RUCENE_TPU_NO_MALLOC_TUNE") != "1":
    # Keep freed large buffers in the heap instead of munmap-ing them.
    # Sandboxed/VM environments with lazily-faulted (remote-backed) memory
    # charge ~0.5ms per FRESH 4K page — 50s to first-touch 256MB — while
    # re-touching warm pages is ~1000x faster. numpy frees big temporaries
    # constantly; without this every temporary re-faults its pages. Top-of-
    # heap retention (no trim, no mmap for big blocks) makes page cost a
    # one-time peak-footprint charge per process.
    try:
        import ctypes as _ctypes

        _libc = _ctypes.CDLL(None, use_errno=True)
        _libc.mallopt(-1, _ctypes.c_int(2**31 - 1))  # M_TRIM_THRESHOLD: never
        _libc.mallopt(-3, _ctypes.c_int(2**31 - 1))  # M_MMAP_THRESHOLD: never
    except Exception:
        pass

if _os.environ.get("RUCENE_TPU_NO_COMPILE_CACHE") != "1":
    # Persistent XLA compile cache: executor shapes cost minutes to compile
    # over remote-TPU links; caching makes every process after the first fast.
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/jax_comp")),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from rucene_tpu.analysis import LowercaseWhitespaceAnalyzer, WhitespaceAnalyzer
from rucene_tpu.doc import (
    Document,
    Field,
    FieldType,
    IndexOptions,
    NumericDocValuesField,
    StoredField,
    StringField,
    Term,
    TextField,
)
from rucene_tpu.doc.field import (
    BinaryDocValuesField,
    FloatPoint,
    IntPoint,
    SortedDocValuesField,
    SortedNumericDocValuesField,
    SortedSetDocValuesField,
)
from rucene_tpu.search.query import (
    BooleanQuery,
    BoostingQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    ExistsQuery,
    PrefixQuery,
    FilterQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PointRangeQuery,
    TermQuery,
)
from rucene_tpu.analysis.tokenizer import Token
from rucene_tpu.search.query_string import parse_query_string
from rucene_tpu.search.sort_field import Sort, SortField
from rucene_tpu.search.searcher import IndexSearcher, ScoreDoc, TopDocs
from rucene_tpu.search.similarity import BM25Similarity

__all__ = [
    "BM25Similarity",
    "BinaryDocValuesField",
    "BooleanQuery",
    "BoostQuery",
    "BoostingQuery",
    "ConstantScoreQuery",
    "DisjunctionMaxQuery",
    "Document",
    "ExistsQuery",
    "PrefixQuery",
    "Field",
    "FieldType",
    "FilterQuery",
    "FloatPoint",
    "IndexOptions",
    "IndexSearcher",
    "IntPoint",
    "LowercaseWhitespaceAnalyzer",
    "MatchAllDocsQuery",
    "NumericDocValuesField",
    "Occur",
    "PhraseQuery",
    "PointRangeQuery",
    "ScoreDoc",
    "Sort",
    "SortField",
    "SortedDocValuesField",
    "SortedNumericDocValuesField",
    "SortedSetDocValuesField",
    "StoredField",
    "StringField",
    "Term",
    "TermQuery",
    "TextField",
    "Token",
    "TopDocs",
    "WhitespaceAnalyzer",
    "parse_query_string",
]
