"""String statistic bounds that stay VALID under parquet stat truncation.

Parquet writers may truncate long string min/max statistics to a prefix.
A truncated MIN is still a valid lower bound (a prefix sorts <= the full
value), but a truncated MAX is NOT an upper bound — using it verbatim
lets a file-skipping layer drop a file that contains matching rows.

Newer pyarrow exposes ``is_min_value_exact``/``is_max_value_exact`` so
readers can tell; the pinned pyarrow (16.x) does not.  The scheme that
is correct in EITHER case is the one the Iceberg spec's own parquet
metrics use (UnicodeUtil.truncateStringMax): publish as the upper bound
a string STRICTLY GREATER than every string sharing the stat's prefix —
increment the last incrementable code point and drop the tail.  If the
stat was exact the bound is merely a touch loose; if it was truncated
the bound is the tightest valid one derivable from the prefix.  Either
way pruning stays conservative.
"""

from __future__ import annotations

_MAX_CP = 0x10FFFF
_SURROGATE_LO, _SURROGATE_HI = 0xD800, 0xDFFF


def string_upper_bound(s: str) -> str | None:
    """A string >= every string having ``s`` as a prefix (and >= ``s``
    itself): walk back from the end, increment the first code point that
    can be incremented, drop everything after it.  ``None`` when no
    position is incrementable (all U+10FFFF — no finite bound exists)."""
    for i in range(len(s) - 1, -1, -1):
        cp = ord(s[i]) + 1
        if _SURROGATE_LO <= cp <= _SURROGATE_HI:
            cp = _SURROGATE_HI + 1
        if cp <= _MAX_CP:
            return s[:i] + chr(cp)
    return None


def stat_string_bounds(st, lo: str, hi: str) -> tuple[str, str | None]:
    """(lower, upper) bounds safe to record for one column chunk's
    string statistics ``lo``/``hi``.  When the footer marks both values
    EXACT (pyarrow >= 17), the stats are usable verbatim; otherwise the
    min stays verbatim (prefix => still a lower bound) and the max goes
    through :func:`string_upper_bound` (upper may come back ``None`` =
    don't record one)."""
    exact = bool(
        getattr(st, "is_min_value_exact", False)
        and getattr(st, "is_max_value_exact", False)
    )
    if exact:
        return lo, hi
    return lo, string_upper_bound(hi)
