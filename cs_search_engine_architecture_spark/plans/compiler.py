"""AST -> DataFrame plan compiler with lazy-NOT De Morgan algebra.

This is the driver-side "optimizer rule" the reference implements in
``_tiered_full_boolean_search`` (``sea/engine.pyx:424-498``): complements
are never materialized; each subtree evaluates to (postings, is_not) and
the parent picks the join type:

    AND(+,+) -> inner join, scores summed (sea/posting_list.pyx:46-75,:15)
    AND(-,+) -> right ANTI left          (:469)
    AND(+,-) -> left ANTI right          (:473)
    AND(-,-) -> full-outer union, flag   (:477, De Morgan)
    OR (+,+) -> full-outer union         (:482)
    OR (-,+) -> left ANTI right, flag    (:487)
    OR (+,-) -> right ANTI left, flag    (:491)
    OR (-,-) -> inner join, flag         (:494)

Phrase leaves chain inner joins with the consecutive-term position-window
predicate expressed with higher-order array functions (JVM-side): the
reference's two-cursor forward scan over the AS-STORED position lists
(``dialect.ref_scan_window`` == ``sea/posting_list.pyx:23-44``), NOT an
any-pair ∃(p,q) test — the scan has blind spots on the non-monotonic
lists a term occurring in several fields produces, and parity includes
them (round-5 soak find). The top-level is_not flag is discarded
exactly as the reference does (``sea/engine.pyx:531-553``)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions.dialect import (
    phrase_window,
)
from cs_search_engine_architecture_spark.operators.decode import term_postings
from cs_search_engine_architecture_spark.oracle.reference import PHRASE_K

RESULT_SCHEMA = "doc_id long, score double"


class QueryCompiler:
    def __init__(
        self,
        spark: SparkSession,
        blocks: DataFrame,
        num_buckets: int,
        single_field: bool = False,
    ):
        self.spark = spark
        self.blocks = blocks
        self.num_buckets = num_buckets
        # Single-field index: every as-stored position list is ascending
        # by construction, where the reference scan is exhaustive — the
        # phrase window compiles to the cheaper any-pair form
        # (dialect.phrase_window; same results, plan-time choice).
        self.single_field = single_field

    def empty(self) -> DataFrame:
        return self.spark.createDataFrame([], RESULT_SCHEMA)

    def _leaf(self, term: str, with_positions: bool = False) -> DataFrame:
        return term_postings(self.blocks, term, self.num_buckets, with_positions)

    def _phrase(self, values: list[str]) -> DataFrame:
        cur = self._leaf(values[0], with_positions=True)
        for term in values[1:]:
            nxt = (
                self._leaf(term, with_positions=True)
                .withColumnRenamed("score", "_s2")
                .withColumnRenamed("positions", "_p2")
            )
            window_ok = F.expr(
                phrase_window(
                    "positions", "_p2", PHRASE_K, self.single_field
                )
            )
            cur = (
                cur.join(nxt, "doc_id")
                .where(window_ok)
                .select(
                    "doc_id",
                    (F.col("score") + F.col("_s2")).alias("score"),
                    F.col("_p2").alias("positions"),
                )
            )
        return cur.select("doc_id", "score")

    def _proximity(
        self, values: list[str], slop: int, ordered: bool
    ) -> DataFrame:
        """Slop-parameterized proximity match (extension beyond the
        reference parser — Lucene ``"a b"~N`` shape, with the engine's
        char-offset position model).

        ordered=True: the phrase chain with the window widened to
        ``slop`` — each CONSECUTIVE pair must have some occurrence
        with char gap in [0, slop], judged independently per pair
        (every join keeps the newly joined term's FULL position array,
        so the intermediate positions need not form one consistent
        walk — exactly the reference phrase constraint's chained
        two-pointer semantics; slop == PHRASE_K reproduces ``_phrase``
        bit-for-bit). ordered=False: one n-way doc join with a nested
        ``exists`` over every term's position array — the doc matches
        iff SOME single choice of one position per term has every
        pairwise char distance ≤ slop (max−min ≤ slop). Duplicate
        terms may reuse one position (|p−p| = 0) — the SQL-join oracle
        has the same property, so both sides agree. Score = strict
        left fold of the matched terms' BM25 in query order (phrase
        parity)."""
        if ordered:
            cur = self._leaf(values[0], with_positions=True)
            for term in values[1:]:
                nxt = (
                    self._leaf(term, with_positions=True)
                    .withColumnRenamed("score", "_s2")
                    .withColumnRenamed("positions", "_p2")
                )
                window_ok = F.expr(
                    phrase_window(
                        "positions", "_p2", slop, self.single_field
                    )
                )
                cur = (
                    cur.join(nxt, "doc_id")
                    .where(window_ok)
                    .select(
                        "doc_id",
                        (F.col("score") + F.col("_s2")).alias("score"),
                        F.col("_p2").alias("positions"),
                    )
                )
            return cur.select("doc_id", "score")

        n = len(values)
        cur = self._leaf(values[0], with_positions=True).select(
            "doc_id",
            F.col("score").alias("_s0"),
            F.col("positions").alias("_pos0"),
        )
        for i, term in enumerate(values[1:], start=1):
            nxt = self._leaf(term, with_positions=True).select(
                "doc_id",
                F.col("score").alias(f"_s{i}"),
                F.col("positions").alias(f"_pos{i}"),
            )
            cur = cur.join(nxt, "doc_id")

        def exists_chain(i: int, chosen: list) -> "F.Column":
            if i == n:
                cond = F.lit(True)
                for a in range(n):
                    for b in range(a + 1, n):
                        cond = cond & (
                            F.abs(chosen[a] - chosen[b]) <= F.lit(slop)
                        )
                return cond
            # NB: single-parameter lambda — pyspark treats a 2nd lambda
            # parameter as the (element, index) HOF form. ``i``/``chosen``
            # are per-call recursion arguments, so capture is safe.
            return F.exists(
                f"_pos{i}", lambda v: exists_chain(i + 1, chosen + [v])
            )

        score = F.col("_s0")
        for i in range(1, n):
            score = score + F.col(f"_s{i}")
        return (
            cur.where(exists_chain(0, []))
            .select("doc_id", score.alias("score"))
        )

    def _eval(self, node: dict) -> tuple[DataFrame, bool]:
        if node["type"] == "token":
            return self._leaf(node["value"]), False
        if node["type"] == "phrase":
            return self._phrase(node["values"]), False
        if node["type"] == "proximity":
            return (
                self._proximity(
                    node["values"], node["slop"], node.get("ordered", True)
                ),
                False,
            )

        op = node["operator"]
        if op == "not":
            df, isnot = self._eval(node["right"])
            return df, not isnot

        left, lnot = self._eval(node["left"])
        right, rnot = self._eval(node["right"])

        def inner() -> DataFrame:
            r = right.withColumnRenamed("score", "_s2")
            return left.join(r, "doc_id").select(
                "doc_id", (F.col("score") + F.col("_s2")).alias("score")
            )

        def union() -> DataFrame:
            r = right.withColumnRenamed("score", "_s2")
            return left.join(r, "doc_id", "full_outer").select(
                "doc_id",
                (
                    F.coalesce(F.col("score"), F.lit(0.0))
                    + F.coalesce(F.col("_s2"), F.lit(0.0))
                ).alias("score"),
            )

        def anti(a: DataFrame, b: DataFrame) -> DataFrame:
            return a.join(b.select("doc_id"), "doc_id", "left_anti")

        if op == "and":
            if not lnot and not rnot:
                return inner(), False
            if lnot and not rnot:
                return anti(right, left), False
            if not lnot and rnot:
                return anti(left, right), False
            return union(), True
        # op == "or"
        if not lnot and not rnot:
            return union(), False
        if lnot and not rnot:
            return anti(left, right), True
        if not lnot and rnot:
            return anti(right, left), True
        return inner(), True

    def compile(self, ast: Optional[dict]) -> DataFrame:
        """AST -> (doc_id, score) DataFrame; top-level NOT flag discarded."""
        if not ast:
            return self.empty()
        df, _ = self._eval(ast)
        return df
