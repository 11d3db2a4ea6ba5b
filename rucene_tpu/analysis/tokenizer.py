"""Token streams. The reference ships only a whitespace tokenizer
(rucene src/core/analysis/whitespace_tokenizer.rs) — callers pre-tokenize.
We mirror that: whitespace split (with optional lowercasing), positions are
token ordinals, offsets are char spans.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Protocol


@dataclass
class Token:
    term: str
    position: int  # absolute position (position_increment always 1 here)
    start_offset: int
    end_offset: int
    payload: bytes | None = None  # per-occurrence payload (reference
    # PayloadAttribute, token_stream.rs); only pre-analyzed fields carry one


def tokenize_whitespace(text: str, lowercase: bool = False) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i].isspace():
            i += 1
        if i >= n:
            break
        start = i
        while i < n and not text[i].isspace():
            i += 1
        term = text[start:i]
        if lowercase:
            term = term.lower()
        tokens.append(Token(term, pos, start, i))
        pos += 1
    return tokens


class Analyzer(Protocol):
    def tokenize(self, field: str, text: str) -> Iterable[Token]: ...


class WhitespaceAnalyzer:
    def tokenize(self, field: str, text: str) -> list[Token]:
        return tokenize_whitespace(text, lowercase=False)


class LowercaseWhitespaceAnalyzer:
    def tokenize(self, field: str, text: str) -> list[Token]:
        return tokenize_whitespace(text, lowercase=True)
