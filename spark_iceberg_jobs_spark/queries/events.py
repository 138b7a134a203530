"""Event-analytics queries (EXTENSION X6) — filled in incrementally."""

from __future__ import annotations

from . import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
