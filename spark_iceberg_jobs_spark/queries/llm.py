"""LLM-data-pipeline queries (EXTENSION X1-X5) — filled in incrementally."""

from __future__ import annotations

from . import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
