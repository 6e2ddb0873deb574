"""Tokenizer conformance — golden vectors adopted verbatim from the
reference's own unit test (``/root/reference/test/test_tokenizer.py:4-31``)
plus targeted quirk coverage (``sea/tokenizer.pyx:81-112``)."""

from cs_search_engine_architecture_spark.functions.tokenizer import (
    QUERY_STOPWORDS,
    STOPWORDS,
    scan,
    tokenize,
)


def test_reference_golden_document_mode():
    tokens, pos = tokenize("hello, world! this is a test.", is_query=False)
    assert tokens == ["hello", "world", "test"]
    assert pos == [0, 7, 24]


def test_reference_golden_query_mode():
    tokens, pos = tokenize(
        'testing and (the tokenizer) with "special" characters!', is_query=True
    )
    assert tokens == ["test", "and", "(", "token", ")", '"', "special", '"', "charact"]
    assert pos == [0, 8, 12, 17, 26, 33, 34, 41, 43]


def test_mixed_alnum_dropped():
    tokens, _ = tokenize("utf8str is here.", is_query=False)
    assert tokens == ["here"]


def test_numeric_length_filter():
    tokens, _ = tokenize("year 2024 code 20244 end.", is_query=False)
    assert tokens == ["year", "2024", "code", "end"]


def test_long_alpha_dropped():
    long_ident = "x" * 51
    tokens, _ = tokenize(f"{long_ident} ok.", is_query=False)
    assert tokens == ["ok"]
    # but <= 50 kept
    tokens, _ = tokenize(f"{'x' * 50} ok.", is_query=False)
    assert tokens == ["x" * 50, "ok"]


def test_trailing_token_bypasses_filter():
    # sea/tokenizer.pyx:109-112: final run emitted unconditionally
    tokens, _ = tokenize("keep utf8str", is_query=False)
    assert tokens == ["keep", "utf8str"]
    tokens, _ = tokenize("keep 20244", is_query=False)
    assert tokens == ["keep", "20244"]
    long_ident = "x" * 51
    tokens, _ = tokenize(f"keep {long_ident}", is_query=False)
    assert tokens == ["keep", long_ident]


def test_stopwords_checked_after_stem():
    # 'wills' stems to 'will' (a stopword) -> dropped
    tokens, _ = tokenize("wills testament.", is_query=False)
    assert tokens == ["testament"]


def test_query_mode_keeps_boolean_operators():
    assert {"and", "or", "not"} <= STOPWORDS
    assert not ({"and", "or", "not"} & QUERY_STOPWORDS)
    tokens, _ = tokenize("apple and not banana.", is_query=True)
    assert tokens == ["appl", "and", "not", "banana"]
    tokens, _ = tokenize("apple and not banana.", is_query=False)
    assert tokens == ["appl", "banana"]


def test_ascii_only_lowercase():
    tokens, _ = tokenize("Hello WORLD Test.", is_query=False)
    assert tokens == ["hello", "world", "test"]


def test_scan_positions_interleave_query_ops():
    got = scan('a"b', is_query=True)
    assert got == [("a", 0), ('"', 1), ("b", 2)]


def test_simple_analyzer_is_sql_equivalent():
    tokens, pos = tokenize(
        "Year 2024 UTF8str running the " + "x" * 51, analyzer="simple"
    )
    assert tokens == ["year", "2024", "utf8str", "running", "the", "x" * 51]
    assert pos[0] == 0
