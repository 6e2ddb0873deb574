"""Code-aware tokenizer reproducing the reference scanner's semantics.

Reference: ``sea/tokenizer.pyx`` (``_scan`` :81-112, ``tokenize`` :114-161).
Faithfully reproduced quirks:

* runs are maximal ``[a-z0-9]+`` sequences after ASCII-only lowercasing
  (``A-Z`` -> ``a-z`` via ``| 0x20``; ``sea/corpus.pyx:75``);
* a run is kept only if it is pure-alpha with length <= 50 OR pure-numeric
  with length <= 4 — mixed alphanumeric runs are DROPPED
  (``sea/tokenizer.pyx:97``);
* the final run at end-of-text is emitted UNCONDITIONALLY, bypassing the
  filter (``sea/tokenizer.pyx:109-112``);
* in query mode ``"``, ``(``, ``)`` are emitted as 1-char operator tokens
  (``sea/tokenizer.pyx:104-107``);
* every token (operators included) is stemmed by truncating the original
  to its Snowball stem length (``sea/tokenizer.pyx:138-139``);
* stopwords are checked AFTER stemming (``sea/tokenizer.pyx:141-144``);
  query mode keeps ``and``/``or``/``not`` (``sea/tokenizer.pyx:21-23``).

Two analyzers are provided:

* ``"reference"`` — the exact semantics above (parity target);
* ``"simple"`` — lowercase ``[a-z0-9]+`` runs, no stem/stop/length filters.
  This analyzer is expressible in ANSI SQL (``regexp_extract_all``), which
  is what the driver's DuckDB cross-check requires; it exercises the same
  distributed dataflow end-to-end.
"""

from __future__ import annotations

import re
from functools import lru_cache

from cs_search_engine_architecture_spark.functions.stemmer import stem

STOPWORDS = frozenset(
    # sea/tokenizer.pyx:15-20
    "a an and are as at be by can for from have if in is it may not of on or "
    "tbd that the this to us we when will with yet you your".split()
)
QUERY_EXCLUDE_WORDS = frozenset(["and", "or", "not"])  # sea/tokenizer.pyx:21-23
QUERY_STOPWORDS = STOPWORDS - QUERY_EXCLUDE_WORDS

# ASCII-only lowercase (A-Z -> a-z), exactly `c | 0x20` for 'A' <= c <= 'Z'
_ASCII_LOWER = str.maketrans(
    {c: c + 0x20 for c in range(ord("A"), ord("Z") + 1)} | {}
)

_RUN = re.compile(r"[a-z0-9]+")
_QUERY_OPS = re.compile(r'["()]')
_ALPHA = re.compile(r"[a-z]+\Z")
_NUM = re.compile(r"[0-9]+\Z")


@lru_cache(maxsize=1 << 17)
def _stem_truncate_cached(token: str) -> str:
    return token[: len(stem(token))]


def ascii_lower(text: str) -> str:
    return text.translate(_ASCII_LOWER)


def scan(text: str, is_query: bool = False) -> list[tuple[str, int]]:
    """The reference scanner: returns ``[(raw_token, char_position), ...]``
    (pre-stem, pre-stopword). ``text`` is ASCII-lowercased internally."""
    lowered = ascii_lower(text)
    n = len(lowered)
    out: list[tuple[str, int]] = []
    runs = list(_RUN.finditer(lowered))
    ops = list(_QUERY_OPS.finditer(lowered)) if is_query else []
    for m in runs:
        tok = m.group()
        if m.end() == n:
            # end-of-text run bypasses the filter (sea/tokenizer.pyx:109-112)
            out.append((tok, m.start()))
            continue
        if _ALPHA.match(tok):
            if len(tok) <= 50:
                out.append((tok, m.start()))
        elif _NUM.match(tok):
            if len(tok) <= 4:
                out.append((tok, m.start()))
        # mixed alphanumeric runs dropped (sea/tokenizer.pyx:97)
    for m in ops:
        out.append((m.group(), m.start()))
    out.sort(key=lambda t: t[1])
    return out


def tokenize(
    text: str,
    is_query: bool = False,
    do_stem: bool = True,
    analyzer: str = "reference",
) -> tuple[list[str], list[int]]:
    """Full tokenize: scan -> stem-truncate -> stopword filter.

    Returns (tokens, char_positions). Mirrors ``Tokenizer.tokenize``
    (``sea/tokenizer.pyx:114-161``) minus the dense token-id assignment: we
    key postings by term string (a global sequential id assignment would be
    a distributed bottleneck; see SURVEY.md T4).
    """
    if analyzer == "simple":
        if is_query:
            # boolean query over a simple-analyzer index: operator tokens
            # still come from the reference scanner, but terms are neither
            # stemmed nor stop-filtered (they must match the simple index)
            pairs = scan(text, is_query=True)
            return [t for t, _ in pairs], [p for _, p in pairs]
        lowered = ascii_lower(text)
        toks: list[str] = []
        poss: list[int] = []
        for m in _RUN.finditer(lowered):
            toks.append(m.group())
            poss.append(m.start())
        return toks, poss

    stopset = QUERY_STOPWORDS if is_query else STOPWORDS
    tokens: list[str] = []
    positions: list[int] = []
    for raw, pos in scan(text, is_query):
        tok = _stem_truncate_cached(raw) if do_stem else raw
        if tok in stopset:
            continue
        tokens.append(tok)
        positions.append(pos)
    return tokens, positions
