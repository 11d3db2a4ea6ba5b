"""Operational tools (CheckIndex etc.)."""

from rucene_tpu.tools.check_index import CheckIndexStatus, check_index

__all__ = ["CheckIndexStatus", "check_index"]
