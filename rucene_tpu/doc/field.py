"""Field schema: what gets indexed / stored / doc-valued per field.

Reference analog: rucene src/core/doc/field.rs:23-260 (Field, FieldType) and
src/core/doc/index_options.rs:18 (IndexOptions). We keep the same per-field
toggles; the storage they select maps onto device tensors instead of
codec streams.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dc_field
from typing import Any


class IndexOptions(enum.IntEnum):
    """How much postings information is recorded for an indexed field."""

    NONE = 0
    DOCS = 1
    DOCS_AND_FREQS = 2
    DOCS_AND_FREQS_AND_POSITIONS = 3
    DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS = 4

    @property
    def has_freqs(self) -> bool:
        return self >= IndexOptions.DOCS_AND_FREQS

    @property
    def has_positions(self) -> bool:
        return self >= IndexOptions.DOCS_AND_FREQS_AND_POSITIONS

    @property
    def has_offsets(self) -> bool:
        return self >= IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS


class DocValuesType(enum.IntEnum):
    NONE = 0
    NUMERIC = 1
    BINARY = 2
    SORTED = 3
    SORTED_NUMERIC = 4
    SORTED_SET = 5


@dataclass(frozen=True)
class FieldType:
    index_options: IndexOptions = IndexOptions.NONE
    stored: bool = False
    tokenized: bool = True
    doc_values_type: DocValuesType = DocValuesType.NONE
    store_term_vectors: bool = False
    omit_norms: bool = False
    point_dimension_count: int = 0
    point_num_bytes: int = 0

    @property
    def indexed(self) -> bool:
        return self.index_options != IndexOptions.NONE


# Canonical field types (mirroring Lucene's TextField / StringField / etc.)
TEXT_FIELD_TYPE_STORED = FieldType(
    index_options=IndexOptions.DOCS_AND_FREQS_AND_POSITIONS, stored=True, tokenized=True
)
TEXT_FIELD_TYPE_NOT_STORED = FieldType(
    index_options=IndexOptions.DOCS_AND_FREQS_AND_POSITIONS, stored=False, tokenized=True
)
STRING_FIELD_TYPE_STORED = FieldType(
    index_options=IndexOptions.DOCS, stored=True, tokenized=False, omit_norms=True
)
STRING_FIELD_TYPE_NOT_STORED = FieldType(
    index_options=IndexOptions.DOCS, stored=False, tokenized=False, omit_norms=True
)
STORED_ONLY_TYPE = FieldType(index_options=IndexOptions.NONE, stored=True, tokenized=False)
NUMERIC_DV_TYPE = FieldType(doc_values_type=DocValuesType.NUMERIC)
BINARY_DV_TYPE = FieldType(doc_values_type=DocValuesType.BINARY)
SORTED_DV_TYPE = FieldType(doc_values_type=DocValuesType.SORTED)
SORTED_NUMERIC_DV_TYPE = FieldType(doc_values_type=DocValuesType.SORTED_NUMERIC)
SORTED_SET_DV_TYPE = FieldType(doc_values_type=DocValuesType.SORTED_SET)


@dataclass
class Field:
    """A named, typed value inside a Document."""

    name: str
    value: Any
    field_type: FieldType = dc_field(default_factory=FieldType)
    boost: float = 1.0


def TextField(
    name: str,
    value,
    stored: bool = False,
    term_vectors: bool = False,
    offsets: bool = False,
) -> Field:
    """`offsets=True` records char offsets in the POSTINGS (IndexOptions
    ..._AND_OFFSETS, reference index_options.rs:18) readable via
    read_postings(with_offsets=True) — independent of term vectors.
    `value` may be a pre-analyzed list[Token] (the reference's
    field-with-TokenStream path, field.rs:202) — the only way occurrences
    get payloads."""
    ft = TEXT_FIELD_TYPE_STORED if stored else TEXT_FIELD_TYPE_NOT_STORED
    if term_vectors or offsets:
        ft = FieldType(
            index_options=(
                IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS
                if offsets
                else IndexOptions.DOCS_AND_FREQS_AND_POSITIONS
            ),
            stored=stored,
            tokenized=True,
            store_term_vectors=term_vectors,
        )
    return Field(name, value, ft)


def StringField(name: str, value: str, stored: bool = False) -> Field:
    return Field(name, value, STRING_FIELD_TYPE_STORED if stored else STRING_FIELD_TYPE_NOT_STORED)


def StoredField(name: str, value: Any) -> Field:
    return Field(name, value, STORED_ONLY_TYPE)


def NumericDocValuesField(name: str, value: int) -> Field:
    return Field(name, int(value), NUMERIC_DV_TYPE)


def BinaryDocValuesField(name: str, value: bytes) -> Field:
    return Field(name, bytes(value), BINARY_DV_TYPE)


def SortedDocValuesField(name: str, value: str) -> Field:
    return Field(name, str(value), SORTED_DV_TYPE)


def SortedNumericDocValuesField(name: str, value: int) -> Field:
    return Field(name, int(value), SORTED_NUMERIC_DV_TYPE)


def SortedSetDocValuesField(name: str, value: str) -> Field:
    return Field(name, str(value), SORTED_SET_DV_TYPE)


def IntPoint(name: str, *values: int) -> Field:
    """1-8 dimensional numeric point for range queries (reference
    point_range_query.rs:366; 1-D reduces to a sorted column, multi-dim to
    a row scan — the BKD tree's roles without the tree)."""
    if not 1 <= len(values) <= 8:
        raise ValueError("points support 1-8 dimensions")
    ft = FieldType(point_dimension_count=len(values), point_num_bytes=8, tokenized=False)
    vals = tuple(int(v) for v in values)
    return Field(name, vals if len(vals) > 1 else vals[0], ft)


def FloatPoint(name: str, *values: float) -> Field:
    """Floats map to sortable ints via the same order-preserving trick as
    Lucene's FloatPoint.encodeDimension."""
    if not 1 <= len(values) <= 8:
        raise ValueError("points support 1-8 dimensions")
    ft = FieldType(point_dimension_count=len(values), point_num_bytes=8, tokenized=False)
    vals = tuple(float(v) for v in values)
    return Field(name, vals if len(vals) > 1 else vals[0], ft)


def float_to_sortable_int(value: float) -> int:
    """Order-preserving f32->i32 map (reference util/numeric.rs analog)."""
    import struct

    bits = struct.unpack("<i", struct.pack("<f", float(value)))[0]
    return bits ^ ((bits >> 31) & 0x7FFFFFFF)
