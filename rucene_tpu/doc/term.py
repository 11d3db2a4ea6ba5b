"""Term = (field, bytes) — the unit of the inverted index
(reference: rucene src/core/doc/term.rs:24)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True, order=True)
class Term:
    field: str
    text: str

    @property
    def bytes(self) -> bytes:
        return self.text.encode("utf-8")

    def __repr__(self) -> str:
        return f"Term({self.field}:{self.text})"
