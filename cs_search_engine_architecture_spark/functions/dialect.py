"""Dual-dialect SQL fragment builders (Spark SQL + DuckDB).

The driver's correctness gate runs every query twice — our Spark plan and
an ANSI-ish DuckDB oracle — and value-hashes the results. For the
training-data-pipeline operators (dedup, fingerprinting, LSH similarity,
text analysis) the only way to guarantee bit-identical values on both
sides is to generate BOTH expression trees from one source of truth.

Every builder here returns a SQL string for the requested ``dialect``
(``"spark"`` | ``"duckdb"``). The Spark strings are used via ``F.expr``
— they compile to built-in Catalyst expressions (whole-stage codegen,
no Python in the executor hot path), so this is the idiomatic fast path,
not a compatibility shim.

Scale note (100 TB): everything built from these fragments is pure
column arithmetic over the row it lives on — no shuffle is introduced by
the expressions themselves, so the operators that use them scale with
the scan. Hash seeds are string literals folded at plan time.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"

# 31^j factors for the 8-hex-char token hash (fits comfortably in int64)
_POW31 = [31**j for j in range(8)]

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 1_000_003


def _d(dialect: str) -> bool:
    if dialect not in (SPARK, DUCKDB):
        raise ValueError(f"unknown dialect {dialect!r}")
    return dialect == DUCKDB


def tokens(dialect: str, col: str = "text") -> str:
    """Simple-analyzer token list: ``[a-z0-9]+`` runs of ``lower(col)``."""
    if _d(dialect):
        return f"regexp_extract_all(lower({col}), '[a-z0-9]+')"
    return f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"


def transform(dialect: str, arr: str, lam: str) -> str:
    fn = "list_transform" if _d(dialect) else "transform"
    return f"{fn}({arr}, {lam})"


def array_min(dialect: str, arr: str) -> str:
    fn = "list_min" if _d(dialect) else "array_min"
    return f"{fn}({arr})"


def array_size(dialect: str, arr: str) -> str:
    fn = "len" if _d(dialect) else "size"
    return f"{fn}({arr})"


def array_join(dialect: str, arr: str, sep: str = " ") -> str:
    fn = "array_to_string" if _d(dialect) else "array_join"
    return f"{fn}({arr}, '{sep}')"


def element_at(dialect: str, arr: str, idx: str) -> str:
    """1-based element access (both engines are 1-based here)."""
    if _d(dialect):
        return f"{arr}[{idx}]"
    return f"element_at({arr}, {idx})"


def int_range(dialect: str, lo: str, hi: str) -> str:
    """Inclusive integer list [lo..hi]; EMPTY when hi < lo (guard Spark's
    reversed-sequence behavior explicitly)."""
    if _d(dialect):
        return f"generate_series({lo}, {hi})"
    return (
        f"(case when ({hi}) >= ({lo}) then sequence({lo}, {hi}) "
        f"else array() end)"
    )


def reduce_bigint(dialect: str, arr: str, lam: str) -> str:
    """Left fold with BIGINT accumulator starting at 0."""
    if _d(dialect):
        return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}), {lam})"
    return f"aggregate({arr}, CAST(0 AS BIGINT), {lam})"


def reduce_double(dialect: str, arr: str, lam: str) -> str:
    """Left fold with DOUBLE accumulator starting at 0.0."""
    if _d(dialect):
        return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {arr}), {lam})"
    return f"aggregate({arr}, CAST(0.0 AS DOUBLE), {lam})"


def token_hash(dialect: str, var: str = "t") -> str:
    """Deterministic 64-bit-safe token hash shared by both engines:
    weighted sum of the first 8 hex chars of md5 (base 31). md5 is the
    only hash both Spark and DuckDB compute identically."""
    terms = " + ".join(
        f"ascii(substr(md5({var}), {j + 1}, 1)) * CAST({_POW31[j]} AS BIGINT)"
        for j in range(8)
    )
    return f"({terms})"


def rolling_fingerprint(dialect: str, toks: str = "toks") -> str:
    """Karp-Rabin polynomial rolling hash over the token sequence
    (order-sensitive document fingerprint):
    ``acc = (acc * B + h(tok)) mod M``."""
    hashed = transform(dialect, toks, f"t -> {token_hash(dialect, 't')}")
    return reduce_bigint(
        dialect,
        hashed,
        f"(acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD}",
    )


def shingles(dialect: str, toks: str = "toks", n: int = 3) -> str:
    """Word n-gram shingle list; a doc with fewer than n tokens
    contributes its whole token string as one shingle."""
    parts = ", ".join(
        element_at(dialect, toks, f"i + {j}") for j in range(n)
    )
    grams = transform(
        dialect,
        int_range(dialect, "1", f"{array_size(dialect, toks)} - {n - 1}"),
        f"i -> concat_ws(' ', {parts})",
    )
    # whole-doc fallback: DuckDB's array_to_string([]) is NULL where
    # Spark's array_join([]) is '' — coalesce pins both to [''] for
    # empty token lists
    whole = f"array({array_join(dialect, toks)})" if dialect == SPARK else (
        f"[coalesce({array_join(dialect, toks)}, '')]"
    )
    return (
        f"(case when {array_size(dialect, toks)} >= {n} then {grams} "
        f"else {whole} end)"
    )


def minhash_sig(dialect: str, shingle_col: str, seed: int) -> str:
    """One MinHash signature component: lexicographic min of seeded md5
    over the shingle set (hex strings order identically in both engines)."""
    return array_min(
        dialect,
        transform(dialect, shingle_col, f"s -> md5(concat('h{seed}:', s))"),
    )


def simhash_bit_contrib(dialect: str, term: str, bit: int) -> str:
    """±1 contribution of one term occurrence to SimHash bit ``bit``
    (bit source: parity of the bit-th hex char of md5(term))."""
    return f"((ascii(substr(md5({term}), {bit + 1}, 1)) % 2) * 2 - 1)"


def dot_product(dialect: str, a: str, b: str) -> str:
    """Σ a[i]*b[i] in double precision (arrays of equal length).
    Both dialects use the SAME strict left fold — ``list_sum`` /
    pairwise summation would differ from Spark's ``aggregate`` in the
    last ulp, which can survive the float32 cast near a rounding
    boundary. (r6 negative result: unrolling the fold into a literal
    64-term add chain IS bit-identical but blows the generated method
    past the JIT's huge-method limit — the whole stage falls back to
    the bytecode interpreter and runs 2.6x SLOWER than the HOF form.
    Keep the HOF; vectorize hot pair-verify loops in numpy kernels
    instead.)"""
    if _d(dialect):
        prods = (
            f"list_transform(list_zip({a}, {b}), "
            f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))"
        )
        return reduce_double(dialect, prods, "(acc, v) -> acc + v")
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def l2_dist_sq(dialect: str, a: str, b: str) -> str:
    """Σ (a[i]-b[i])² in double precision, STRICT LEFT FOLD — the IVF
    assignment metric. The Spark-side numpy kernel (``similarity.
    ivf_assign``) accumulates dimensions in the same order, so cell
    assignments agree bitwise with the DuckDB oracle."""
    if _d(dialect):
        sq = (
            f"list_transform(list_zip({a}, {b}), p -> "
            f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
            f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))"
        )
        return reduce_double(dialect, sq, "(acc, v) -> acc + v")
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def l2_norm(dialect: str, a: str) -> str:
    sq = transform(dialect, a, "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)")
    return f"sqrt({reduce_double(dialect, sq, '(acc, v) -> acc + v')})"


def hyperplane_coef(dialect: str, plane: int, dim_var: str) -> str:
    """Deterministic pseudo-random ±1 hyperplane coefficient for
    (plane, dim) — derived from md5 so both engines agree exactly."""
    return (
        f"((ascii(substr(md5(concat('p{plane}_', {dim_var})), 1, 1)) % 2) "
        f"* 2 - 1)"
    )


def hyperplane_coefs(plane: int, dims: int) -> list[int]:
    """The (plane, dim) ±1 coefficient row, computed driver-side — the
    exact integers the ``hyperplane_coef`` SQL fragment yields (md5 of
    ``p{plane}_{d}`` for d = 1..dims, parity of the first hex char)."""
    import hashlib

    return [
        (ord(hashlib.md5(f"p{plane}_{d}".encode()).hexdigest()[0]) % 2) * 2
        - 1
        for d in range(1, dims + 1)
    ]


def hyperplane_dot(dialect: str, emb: str, plane: int, dims: int) -> str:
    """Σ_d emb[d] * coef(plane, d) in double precision, strict left
    fold.

    The coefficient row is row-INDEPENDENT, so it embeds as a literal
    array instead of the inline-md5 form: the md5 sits inside a
    higher-order-function lambda, which Catalyst cannot constant-fold —
    a 16-plane × 64-dim bucketing evaluated 1024 md5(concat(...)) calls
    PER ROW and pushed whole-stage codegen past the 64 KB method limit
    (interpreted fallback). int ±1 × double products and the fold order
    are unchanged, so results are bit-identical to the inline form (and
    to the ``bucket_of`` python mirror)."""
    lits = ", ".join(str(c) for c in hyperplane_coefs(plane, dims))
    if _d(dialect):
        prods = (
            f"list_transform(list_zip({emb}, [{lits}]), "
            f"x -> CAST(x[1] AS DOUBLE) * x[2])"
        )
        return reduce_double(dialect, prods, "(acc, x) -> acc + x")
    return (
        f"aggregate(zip_with({emb}, array({lits}), "
        f"(x, c) -> CAST(x AS DOUBLE) * c), CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + x)"
    )


def lsh_bucket(
    dialect: str, emb: str, num_planes: int, dims: int, offset: int = 0
) -> str:
    """Random-hyperplane LSH bucket id: sign bits of ``num_planes``
    hyperplane dot products packed into an integer. ``offset`` selects a
    disjoint plane family (band b of banded LSH uses planes
    ``[b·P, (b+1)·P)``), so multiple independent bucketings can be
    derived from one deterministic md5 plane source."""
    bits = " + ".join(
        f"(case when {hyperplane_dot(dialect, emb, offset + p, dims)} > 0 "
        f"then {1 << p} else 0 end)"
        for p in range(num_planes)
    )
    return f"({bits})"


def to_str(dialect: str, col: str) -> str:
    """String cast (Spark STRING vs DuckDB VARCHAR)."""
    return f"CAST({col} AS {'VARCHAR' if _d(dialect) else 'STRING'})"


def regexp_replace_all(dialect: str, col: str, pattern: str, rep: str) -> str:
    """Replace EVERY match (Spark's default; DuckDB needs the 'g' flag).
    Patterns must stay in the Java-regex ∩ RE2 common subset — character
    classes, bounded repetition, alternation; no backrefs/lookarounds.
    Spark SQL string literals consume one level of backslash escaping
    (Hive-style), DuckDB's are SQL-standard-literal — so the pattern is
    doubled for Spark only."""
    if _d(dialect):
        return f"regexp_replace({col}, '{pattern}', '{rep}', 'g')"
    spark_pat = pattern.replace("\\", "\\\\")
    return f"regexp_replace({col}, '{spark_pat}', '{rep}')"


# conservative PII-shaped patterns (Java-regex ∩ RE2; applied in order)
REDACT_PATTERNS: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    (r"\d{3}[- .]\d{3}[- .]\d{4}", "<PHONE>"),
]


def redact(dialect: str, col: str = "text") -> str:
    """Chained whole-string PII redaction over ``col``."""
    out = col
    for pattern, rep in REDACT_PATTERNS:
        out = regexp_replace_all(dialect, out, pattern, rep)
    return out


SPLIT_BUCKETS = 1000


def split_bucket(dialect: str, id_col: str = "doc_id", seed: str = "s1") -> str:
    """Deterministic, seed-keyed bucket in [0, SPLIT_BUCKETS) from the
    row id — the content-independent train/val/test assignment hash.
    Same md5-based token hash both engines compute identically."""
    keyed = f"concat('split-{seed}:', {to_str(dialect, id_col)})"
    return f"({token_hash(dialect, keyed)} % {SPLIT_BUCKETS})"


def array_max_abs(dialect: str, arr: str) -> str:
    """max(|x|) over a float array, in double."""
    absd = transform(dialect, arr, "x -> abs(CAST(x AS DOUBLE))")
    fn = "list_max" if _d(dialect) else "array_max"
    return f"{fn}({absd})"


QUANT_LEVELS = 127  # symmetric int8 range
QUANT_EPS = "1e-30"  # zero-vector guard


def quantize_vec(dialect: str, arr: str) -> str:
    """Symmetric per-vector int8 quantization: q_i = round(x_i / s) with
    s = max(greatest(|x|), eps) / 127. round() is half-away-from-zero in
    BOTH engines; all arithmetic is double, so the int codes agree
    exactly."""
    s = quant_scale(dialect, arr)
    return transform(
        dialect, arr, f"x -> CAST(round(CAST(x AS DOUBLE) / {s}) AS INT)"
    )


def quant_scale(dialect: str, arr: str) -> str:
    g = "greatest" if not _d(dialect) else "greatest"
    return (
        f"({g}({array_max_abs(dialect, arr)}, {QUANT_EPS}) / {QUANT_LEVELS})"
    )


def int_dot(dialect: str, a: str, b: str) -> str:
    """Σ a[i]*b[i] over INT arrays, accumulated in BIGINT — exact, so
    the result is fold-order-independent (unlike float dots): quantized
    similarity needs no left-fold discipline."""
    if _d(dialect):
        prods = (
            f"list_transform(list_zip({a}, {b}), "
            f"x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))"
        )
        return reduce_bigint(dialect, prods, "(acc, v) -> acc + v")
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def int_l2_norm(dialect: str, a: str) -> str:
    """sqrt(Σ a[i]²) of an INT array — exact integer sum, one final
    IEEE sqrt; deterministic in both engines."""
    return f"sqrt(CAST({int_dot(dialect, a, a)} AS DOUBLE))"


def array_slice(dialect: str, arr: str, start: str, length: int) -> str:
    """1-based, length-``length`` sub-array (both engines inclusive)."""
    if _d(dialect):
        return f"list_slice({arr}, {start}, {start} + {length - 1})"
    return f"slice({arr}, {start}, {length})"


def gram_hashes(dialect: str, toks: str, w: int) -> str:
    """List of md5 hex strings, one per W-token gram start position
    (1-based; empty when the doc has fewer than ``w`` tokens). The
    gram string is the space-joined token slice, so two occurrences
    hash equal iff their normalized token runs are identical —
    verified byte-identical across engines."""
    gram = array_join(dialect, array_slice(dialect, toks, "i", w))
    return transform(
        dialect,
        int_range(dialect, "1", f"{array_size(dialect, toks)} - {w - 1}"),
        f"i -> md5({gram})",
    )


def hex_digit_val(dialect: str, c: str) -> str:
    """Integer value 0-15 of one lowercase hex character (both md5
    implementations emit lowercase hex)."""
    return f"(ascii({c}) - CASE WHEN ascii({c}) >= 97 THEN 87 ELSE 48 END)"


def hex_prefix60(dialect: str, hexcol: str) -> str:
    """First 15 hex digits of an existing lowercase-hex column as an
    exact BIGINT in [0, 2^60) — integer positional arithmetic, no
    float, no conv(). ``hexcol`` should be a MATERIALIZED column when
    it's an md5() call: neither engine is guaranteed to CSE the 15
    repeated substr(md5(...)) terms (Spark measured 2× slower
    inlined)."""
    terms = " + ".join(
        f"{hex_digit_val(dialect, f'substr({hexcol}, {j + 1}, 1)')}"
        f" * CAST({16 ** (14 - j)} AS BIGINT)"
        for j in range(15)
    )
    return f"({terms})"


def md5_prefix60(dialect: str, col: str) -> str:
    """``hex_prefix60`` over md5(col) inline — a uniform
    order-preserving 60-bit hash shared by both engines. For hot Spark
    paths prefer materializing md5 first and using ``hex_prefix60``
    (see its docstring); this inline form is for oracle SQL where the
    15× md5 doesn't matter."""
    return hex_prefix60(dialect, f"md5({col})")


def ref_scan_window(xs: str, ys: str, k: int) -> str:
    """The reference phrase constraint as ONE boolean SQL expression:
    a single forward scan with two cursors over the AS-STORED position
    lists (``sea/posting_list.pyx:23-44``), NOT an any-pair ∃ test.

    Positions are stored field-concatenated with each field's offsets
    relative to its OWN start (``sea/corpus.pyx:117-197``), so a term
    occurring in more than one field has a NON-monotonic list — and the
    reference's merge-style scan then has blind spots an exhaustive
    ∃(p,q) search doesn't: it advances past pairs it never examines.
    Parity requires replicating the scan verbatim (found by the
    round-5 soak differential: title "sorted query salt" + body
    "query ..." — ``"query sorted"`` must NOT match, the scan skips
    the (body query@0, title sorted@0) pair). On monotonic lists the
    scan is exhaustive, so single-field behavior — including every
    DuckDB gate oracle's any-pair join — is unchanged.

    Scan semantics mirrored exactly: d = ys[j] - xs[i]; match iff
    0 ≤ d ≤ k (the reference's uint32 wrap of a negative d can never
    land ≤ k for char offsets, so signed d ≥ 0 is equivalent);
    otherwise advance i when xs[i] + k < ys[j], else j. Spark-side
    only — no DuckDB twin, by the single-field argument above.

    NB: lambda variable names are prefixed ``_rw`` so the fragment can
    nest inside other higher-order functions (Spark forbids shadowed
    lambda names)."""
    step = (
        "CASE "
        f"WHEN _rwa.f OR _rwa.i > size({xs}) OR _rwa.j > size({ys}) "
        "THEN _rwa "
        f"WHEN element_at({ys}, _rwa.j) - element_at({xs}, _rwa.i) >= 0 "
        f"AND element_at({ys}, _rwa.j) - element_at({xs}, _rwa.i) "
        f"<= {int(k)} "
        "THEN named_struct('i', _rwa.i, 'j', _rwa.j, 'f', true) "
        f"WHEN element_at({xs}, _rwa.i) + {int(k)} "
        f"< element_at({ys}, _rwa.j) "
        "THEN named_struct('i', _rwa.i + 1, 'j', _rwa.j, 'f', false) "
        "ELSE named_struct('i', _rwa.i, 'j', _rwa.j + 1, 'f', false) "
        "END"
    )
    return (
        f"CASE WHEN size({xs}) = 0 OR size({ys}) = 0 THEN false ELSE "
        f"aggregate(sequence(1, size({xs}) + size({ys})), "
        "named_struct('i', 1, 'j', 1, 'f', false), "
        f"(_rwa, _rws) -> {step}, _rwa -> _rwa.f) END"
    )


def any_pair_window(xs: str, ys: str, k: int) -> str:
    """∃(p ∈ xs, q ∈ ys): 0 ≤ q − p ≤ k as a short-circuiting nested
    ``exists`` — the cheaper equivalent of ``ref_scan_window`` on
    MONOTONIC position lists. On ascending lists the reference's
    two-cursor scan is exhaustive (the classic two-pointer argument:
    when it advances a cursor, every pair it skips is provably outside
    the window), so scan ≡ any-pair there — the same equivalence that
    keeps the single-field DuckDB gate oracles' any-pair joins valid
    against the scan. Only ``phrase_window(..., monotonic=True)`` may
    select this form; non-monotonic (multi-field) lists MUST use the
    scan, whose blind spots are parity (round-5 soak find).

    Lambda variables are prefixed ``_ap`` so the fragment nests inside
    other higher-order functions without shadowing."""
    return (
        f"exists({xs}, _apx -> exists({ys}, _apy -> "
        f"_apy - _apx >= 0 AND _apy - _apx <= {int(k)}))"
    )


def phrase_window(xs: str, ys: str, k: int, monotonic: bool) -> str:
    """The phrase char-window predicate, picked at PLAN TIME:
    ``monotonic=True`` (single-field index — every as-stored position
    list is ascending by construction) selects the short-circuiting
    any-pair form; otherwise the reference's two-cursor scan, blind
    spots included. Zero per-row cost: the caller knows field count
    from index metadata, so no runtime sortedness test is paid."""
    if monotonic:
        return any_pair_window(xs, ys, k)
    return ref_scan_window(xs, ys, k)
