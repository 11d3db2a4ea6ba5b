"""Tokenization (reference: rucene src/core/analysis/ — whitespace tokenizer
plus pre-tokenized streams; analyzers beyond that are the caller's job)."""

from rucene_tpu.analysis.tokenizer import (
    Analyzer,
    LowercaseWhitespaceAnalyzer,
    Token,
    WhitespaceAnalyzer,
    tokenize_whitespace,
)

__all__ = [
    "Analyzer",
    "LowercaseWhitespaceAnalyzer",
    "Token",
    "WhitespaceAnalyzer",
    "tokenize_whitespace",
]
