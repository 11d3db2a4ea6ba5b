"""Highlighting (reference: rucene src/core/highlight/)."""

from rucene_tpu.highlight.fvh import FastVectorHighlighter, FieldQuery

__all__ = ["FastVectorHighlighter", "FieldQuery"]
