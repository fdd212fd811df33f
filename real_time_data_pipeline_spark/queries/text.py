"""Text-analysis query surface (filled by operators/text.py milestone)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
