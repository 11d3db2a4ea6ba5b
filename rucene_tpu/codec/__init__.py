"""Codec layer: packed postings, device tensors, file formats."""
