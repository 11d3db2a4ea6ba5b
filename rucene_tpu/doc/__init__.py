"""Document / field / term model (reference: rucene src/core/doc/)."""

from rucene_tpu.doc.field import (
    DocValuesType,
    Field,
    FieldType,
    IndexOptions,
    NumericDocValuesField,
    StoredField,
    StringField,
    TextField,
)
from rucene_tpu.doc.document import Document
from rucene_tpu.doc.term import Term

__all__ = [
    "DocValuesType",
    "Document",
    "Field",
    "FieldType",
    "IndexOptions",
    "NumericDocValuesField",
    "StoredField",
    "StringField",
    "Term",
    "TextField",
]
