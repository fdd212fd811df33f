"""Deduplication query surface (filled by operators/dedup.py milestone)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
