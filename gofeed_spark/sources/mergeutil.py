"""Shared MERGE helpers for the Delta and Iceberg writers."""

from __future__ import annotations

import re


def cond_sql(cond: str) -> str:
    """Rewrite a ``WHEN MATCHED AND <cond>`` guard's ``t.``/``s.`` row
    aliases to the joined frame's ``__t``/``__s`` struct columns
    (word-boundary rewrite, so ``sort.x`` or column names ending in
    ``t``/``s`` never match)."""
    return re.sub(r"\bs\.", "__s.", re.sub(r"\bt\.", "__t.", cond))
