"""Document = ordered collection of Fields (reference: doc/document.rs:84)."""

from __future__ import annotations

from typing import Any, Iterator

from rucene_tpu.doc.field import Field


class Document:
    def __init__(self, fields: list[Field] | None = None):
        self.fields: list[Field] = list(fields) if fields else []

    def add(self, field: Field) -> "Document":
        self.fields.append(field)
        return self

    def get(self, name: str) -> Any | None:
        for f in self.fields:
            if f.name == name:
                return f.value
        return None

    def get_all(self, name: str) -> list[Any]:
        return [f.value for f in self.fields if f.name == name]

    def __iter__(self) -> Iterator[Field]:
        return iter(self.fields)

    def __len__(self) -> int:
        return len(self.fields)

    def __repr__(self) -> str:
        return f"Document({[f.name for f in self.fields]})"
