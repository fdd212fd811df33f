"""Similarity-search query surface (filled by operators/similarity.py milestone)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
