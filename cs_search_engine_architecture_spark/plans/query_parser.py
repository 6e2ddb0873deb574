"""Driver-side boolean/phrase query parser.

Re-expresses the reference's query pipeline over term *strings* instead of
dense token ids: the six token-level rewrite passes
(``sea/query.pyx:212-338``, applied in the order of ``:111-116``) followed by
the shunting-yard parse (``sea/query.pyx:89-209``).

Faithfully reproduced semantics:

* precedence ``not(3) > and(2) > or(1)`` (``sea/query.pyx:71-74``);
* the pop condition is *strictly greater* precedence (``sea/query.pyx:135``),
  so same-precedence chains associate to the RIGHT (``a and b and c`` parses
  as ``a AND (b AND c)``);
* ``not`` is unary — left child is the empty dict, matching
  ``query_tree_to_dict(NULL)`` (``sea/query.pyx:43-59``);
* a phrase with a single token degrades to a plain token leaf
  (``sea/query.pyx:47-53``);
* queries with no content tokens parse to ``None`` (``sea/query.pyx:96-109``).

AST shape (golden-compatible with ``test/test_query_parser.py:33-125``):
``{"type": "token", "value": term}`` |
``{"type": "phrase", "values": [terms]}`` |
``{"type": "operator", "operator": op, "left": ast|{}, "right": ast}``.
"""

from __future__ import annotations

from typing import Optional

from cs_search_engine_architecture_spark.functions.tokenizer import tokenize

AND, OR, NOT, OPEN, CLOSE, PHRASE = "and", "or", "not", "(", ")", '"'
_SPECIAL = frozenset([AND, OR, NOT, OPEN, CLOSE, PHRASE])
_BINARY = frozenset([AND, OR])
_PRECEDENCE = {OR: 1, AND: 2, NOT: 3}


def _remove_empty_parens(tokens: list[str]) -> list[str]:
    out, i, n = [], 0, len(tokens)
    while i < n:
        if tokens[i] == OPEN and i + 1 < n and tokens[i + 1] == CLOSE:
            i += 2
            continue
        out.append(tokens[i])
        i += 1
    return out


def _remove_surrounding_operators(tokens: list[str]) -> list[str]:
    tokens = list(tokens)
    while tokens and tokens[0] in _BINARY:
        tokens.pop(0)
    while tokens and tokens[-1] in _BINARY:
        tokens.pop()
    return tokens


def _remove_double_phrase_marker(tokens: list[str]) -> list[str]:
    out, i, n = [], 0, len(tokens)
    while i < n:
        if tokens[i] == PHRASE and i + 1 < n and tokens[i + 1] == PHRASE:
            i += 2
            continue
        out.append(tokens[i])
        i += 1
    return out


def _remove_consecutive_operators(tokens: list[str]) -> list[str]:
    out: list[str] = []
    prev = None
    for tok in tokens:
        if tok in _BINARY and prev is not None and prev in _BINARY:
            continue
        out.append(tok)
        prev = tok
    return out


def _fill_implicit_ands(tokens: list[str]) -> list[str]:
    if not tokens:
        return []
    out = [tokens[0]]
    is_phrase = tokens[0] == PHRASE
    for tok in tokens[1:]:
        prev = out[-1]
        if (
            tok not in _BINARY
            and prev not in _BINARY
            and prev != NOT
            and not is_phrase
            and prev != OPEN
            and tok != CLOSE
        ):
            out.append(AND)
        if tok == PHRASE:
            is_phrase = not is_phrase
        out.append(tok)
    return out


def _remove_ands_in_phrases(tokens: list[str]) -> list[str]:
    out: list[str] = []
    is_phrase = False
    for tok in tokens:
        if tok == PHRASE:
            is_phrase = not is_phrase
        if tok in _BINARY and is_phrase:
            continue
        out.append(tok)
    return out


def _token_node(value: str) -> dict:
    return {"type": "token", "value": value}


def _phrase_node(values: list[str]) -> dict:
    if len(values) == 1:
        return _token_node(values[0])
    return {"type": "phrase", "values": list(values)}


def _op_node(op: str, left: Optional[dict], right: dict) -> dict:
    return {
        "type": "operator",
        "operator": op,
        "left": left if left is not None else {},
        "right": right,
    }


def parse_tokens(tokens: list[str]) -> Optional[dict]:
    """Shunting-yard parse of query-mode tokens -> AST dict (or None)."""
    if not tokens:
        return None
    if not any(t not in _SPECIAL for t in tokens):
        return None

    tokens = _remove_empty_parens(tokens)
    tokens = _remove_surrounding_operators(tokens)
    tokens = _remove_double_phrase_marker(tokens)
    tokens = _remove_consecutive_operators(tokens)
    tokens = _fill_implicit_ands(tokens)
    tokens = _remove_ands_in_phrases(tokens)
    if not tokens:
        return None

    op_stack: list[str] = []
    val_stack: list[dict] = []
    is_phrase = False
    phrase_tokens: list[str] = []

    def reduce_top() -> None:
        # the reference pops unconditionally (UB on malformed stacks,
        # sea/query.pyx:137-149); we instead drop a dangling binary operator
        op = op_stack.pop()
        right = val_stack.pop()
        if op != NOT and not val_stack:
            val_stack.append(right)
            return
        left = val_stack.pop() if op != NOT else None
        val_stack.append(_op_node(op, left, right))

    for tok in tokens:
        if tok in _PRECEDENCE:
            while (
                op_stack
                and op_stack[-1] in _PRECEDENCE
                and _PRECEDENCE[op_stack[-1]] > _PRECEDENCE[tok]
                and val_stack
            ):
                reduce_top()
            op_stack.append(tok)
        elif tok == OPEN:
            op_stack.append(tok)
        elif tok == CLOSE:
            while op_stack and op_stack[-1] != OPEN and val_stack:
                reduce_top()
            if op_stack:
                op_stack.pop()
        elif tok == PHRASE:
            is_phrase = not is_phrase
            if is_phrase:
                phrase_tokens = []
            else:
                val_stack.append(_phrase_node(phrase_tokens))
        else:
            if is_phrase:
                phrase_tokens.append(tok)
            else:
                val_stack.append(_token_node(tok))

    while op_stack and val_stack:
        if op_stack[-1] == OPEN:
            op_stack.pop()
            continue
        reduce_top()
    return val_stack[0] if val_stack else None


def parse_query(query: str, analyzer: str = "reference") -> Optional[dict]:
    """Tokenize (query mode: ``sea/engine.pyx:519-524``) then parse."""
    tokens, _ = tokenize(query, is_query=True, analyzer=analyzer)
    return parse_tokens(tokens)


def strip_top_not(ast: Optional[dict]) -> Optional[dict]:
    """Drop top-level unary-NOT wrappers — an exact identity: the
    compiler evaluates the operand and DISCARDS the root complement
    flag (``sea/engine.pyx:531-553``), so ``not X`` matches and scores
    exactly like ``X`` at the root. Routers/classifiers strip first so
    ``not spark`` rides the single-term/WAND/batched fast paths
    instead of falling back to the join plan."""
    while (
        ast is not None
        and ast.get("type") == "operator"
        and ast.get("operator") == "not"
    ):
        ast = ast["right"]
    return ast
