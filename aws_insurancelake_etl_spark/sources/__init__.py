"""File-format readers (scans)."""

from .readers import read_input  # noqa: F401
