"""Operational tools (CheckIndex etc.)."""

from rucene_tpu.tools.check_index import CheckIndexStatus, check_index, exorcise

__all__ = ["CheckIndexStatus", "check_index", "exorcise"]
