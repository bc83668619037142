"""PromQL-surface queries (SURVEY.md §2.9) — populated as the PromQL builder
lands; golden tests in tests/test_promql.py carry the semantics checks."""

from __future__ import annotations

QUERIES: dict = {}
