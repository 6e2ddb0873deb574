"""Snippet extraction (reference Q10: ``Engine._get_snippet``,
``sea/engine.pyx:366-398``) as pure column expressions.

Reference algorithm, mirrored branch-for-branch (0-based char indices):

1. ``position`` = snippet_position (first matched-term char offset) or 1
   when unknown; clamped to ≥ 1 (``:369-371``);
2. ``start = position - 100`` if ``position >= 100`` else 1 (``:372``);
3. ``end = start + 200`` if that is ``< len`` else ``len`` (``:373``);
4. forward-scan ``[start, end)`` for the first space; if found at i > 0,
   ``start = i + 1`` (``:379-383, 389-390``);
5. if ``end != len``: backward-scan ``(start, end]`` for the last space;
   if found and > start, ``end = last`` (``:384-387, 391-392``);
6. snippet = chars ``[start, end)``.

Cosmetic, not rank-bearing (SURVEY.md Q10) — but cheap: ``locate`` /
``substring`` / ``reverse`` fold into whole-stage codegen over the
already-materialized top-k rows only (the expression runs AFTER the
``limit(k)``, never on the full corpus).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SNIPPET_RADIUS = 100  # sea/engine.pyx:29


def snippet_col(
    text: Column | str, position: Column, radius: int = SNIPPET_RADIUS
) -> Column:
    """Snippet column from (text, 0-based first-match position)."""
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text)
    pos = F.when(position.isNull() | (position <= 0), F.lit(1)).otherwise(
        position.cast("int")
    )
    start = F.when(pos >= radius, pos - radius).otherwise(F.lit(1))
    end = F.when(start + 2 * radius < n, start + 2 * radius).otherwise(n)

    # forward scan [start, end) for the first space. 0-based index i maps
    # to the 1-based locate() world as i+1; locate(sub, str, p) starts at p
    # (call_function: python F.locate only takes an int literal position).
    fs_found = F.call_function(
        "locate", F.lit(" "), text, (start + 1).cast("int")
    )  # 1-based, 0 = none
    f0 = F.when(
        (fs_found > 0) & (fs_found - 1 < end), fs_found - 1
    ).otherwise(F.lit(0))

    # backward scan (start, end] for the last space — BOTH scans use the
    # original start (the reference updates start_pos only afterwards).
    # Window = 0-based indices start+1 .. end (length end-start); reverse
    # it and locate the first space.
    win = F.substring(text, (start + 2).cast("int"), (end - start).cast("int"))
    rev = F.locate(" ", F.reverse(win))
    l0 = F.when((end != n) & (rev > 0), end + 1 - rev).otherwise(F.lit(0))

    start2 = F.when(f0 > 0, f0 + 1).otherwise(start)
    end2 = F.when((l0 > 0) & (l0 > start2), l0).otherwise(end)
    return F.substring(
        text, (start2 + 1).cast("int"), (end2 - start2).cast("int")
    )


def snippet_py(text: str, position: int | None, radius: int = SNIPPET_RADIUS) -> str:
    """Pure-Python mirror of ``sea/engine.pyx:366-398`` (test oracle)."""
    n = len(text)
    pos = position if position and position > 0 else 1
    start = pos - radius if pos >= radius else 1
    end = start + 2 * radius if start + 2 * radius < n else n
    first_space = 0
    for i in range(start, end):
        if i < n and text[i] == " ":
            first_space = i
            break
    last_space = 0
    if end != n:
        for i in range(end, start, -1):
            if i < n and text[i] == " ":
                last_space = i
                break
    if first_space > 0:
        start = first_space + 1
    if last_space > 0 and last_space > start:
        end = last_space
    return text[start:end]
