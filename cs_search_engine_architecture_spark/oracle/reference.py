"""Pure-Python oracle mirroring the reference engine's semantics exactly.

This is the single source of truth for "rank-identical to the reference"
(SURVEY.md §7 Phase 0): a tiny, obviously-correct, single-process
implementation of the full index-build + query pipeline whose component
behaviours are pinned to the reference's own golden unit vectors. All Spark
golden fixtures are generated from this oracle.

Mirrored semantics (reference file:line):

* tokenization / stemming / stopwords — shared module
  (``functions/tokenizer.py``; goldens from ``test/test_tokenizer.py``);
* per-doc aggregation: per-field frequencies, post-filter field lengths,
  char positions concatenated field-by-field, each relative to its own
  field start (``sea/corpus.pyx:117-197``);
* df/idf: ``idf = ln((N - df + 0.5) / (df + 0.5))`` — natural log, may go
  negative, no floor (``sea/indexer.pyx:344-345``);
* index-time BM25 (``sea/document.pyx:254-280``):
  ``tf = Σ_f ff_f·boost_f / (1 + b_f + (1-b_f)·(len_f/avg_f))`` — note the
  non-standard ``1 + b + ...`` normalizer — and
  ``score = idf · tf·(k+1)/(tf+k)``, k=1.5, boosts=[1.0, 0.5],
  b=[0.75, 0.75] (``sea/indexer.pyx:22-24``);
* posting-list algebra on doc_id-sorted lists with score summation on merge
  (``sea/posting_list.pyx:7-191``);
* phrase constraint between consecutive terms' position lists:
  match iff ∃(p, q): p ≤ q ≤ p+k with k=10 chars
  (``sea/posting_list.pyx:23-44``; the unsigned-wraparound ``< 0`` check
  reduces to exactly this ordered-window predicate);
* lazy NOT De Morgan algebra (``sea/engine.pyx:455-498``) with the
  top-level NOT flag ignored (``sea/engine.pyx:531-553`` discards
  ``results_pair.second``);
* top-k tie-break ``(score desc, doc_id asc)`` — the reference's own sort
  is unstable (``std::sort``, ``sea/engine.pyx:599``), so ties are defined
  by this contract and applied to oracle and engine alike (FIXTURES.md §6).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from cs_search_engine_architecture_spark.functions.tokenizer import tokenize
from cs_search_engine_architecture_spark.plans.query_parser import parse_query

BM25_K = 1.5  # sea/indexer.pyx:24
BM25_FIELD_BOOSTS = (1.0, 0.5)  # sea/indexer.pyx:22
BM25_BS = (0.75, 0.75)  # sea/indexer.pyx:23
PHRASE_K = 10  # sea/engine.pyx:445


@dataclass
class Posting:
    doc_id: int
    field_frequencies: list[int]
    field_lengths: list[int]
    positions: list[int]  # field-concatenated, each relative to field start
    score: float = 0.0


@dataclass
class ResultPosting:
    """Query-time accumulator (``sea/document.pxd:40-50``)."""

    doc_id: int
    total_score: float
    # one positions vector per merged term, in merge order
    char_positions: list[list[int]] = field(default_factory=list)
    terms: list[str] = field(default_factory=list)


class OracleIndex:
    def __init__(
        self,
        docs: list[tuple[int, list[str]]],
        analyzer: str = "reference",
        field_boosts: tuple[float, ...] | None = None,
        bm25_bs: tuple[float, ...] | None = None,
        bm25_k: float = BM25_K,
    ):
        """``docs``: list of (doc_id, [field_0_text, ..., field_{nf-1}_text])."""
        num_fields = len(docs[0][1]) if docs else 1
        self.num_fields = num_fields
        self.field_boosts = list(
            field_boosts
            if field_boosts is not None
            else BM25_FIELD_BOOSTS[:num_fields]
            if num_fields <= 2
            else [1.0] * num_fields
        )
        self.bm25_bs = list(
            bm25_bs if bm25_bs is not None else BM25_BS[:num_fields]
        )
        self.bm25_k = bm25_k
        self.analyzer = analyzer

        self.num_documents = 0
        self.num_postings = 0
        summed_field_lengths = [0] * num_fields
        index: dict[str, dict[int, Posting]] = {}

        for doc_id, fields in docs:
            self.num_documents += 1
            per_doc: dict[str, Posting] = {}
            field_lengths = [0] * num_fields
            for f_idx, text in enumerate(fields):
                toks, poss = tokenize(text or "", is_query=False, analyzer=analyzer)
                field_lengths[f_idx] = len(toks)
                for tok, pos in zip(toks, poss):
                    p = per_doc.get(tok)
                    if p is None:
                        p = Posting(doc_id, [0] * num_fields, field_lengths, [])
                        per_doc[tok] = p
                    p.field_frequencies[f_idx] += 1
                    p.positions.append(pos)
            for f_idx in range(num_fields):
                summed_field_lengths[f_idx] += field_lengths[f_idx]
            for tok, p in per_doc.items():
                # field_lengths list is shared by reference postings too
                # (sea/corpus.pyx:168) and is final after the doc loop
                index.setdefault(tok, {})[doc_id] = p
                self.num_postings += 1

        self.avg_field_lengths = [
            (s / self.num_documents) if self.num_documents else 0.0
            for s in summed_field_lengths
        ]
        # doc_id-sorted posting lists (sea/indexer.pyx:251)
        self.index: dict[str, list[Posting]] = {
            t: [ps[d] for d in sorted(ps)] for t, ps in index.items()
        }
        self.document_frequencies = {t: len(ps) for t, ps in self.index.items()}
        # idf + index-time BM25 scores (sea/indexer.pyx:344-345,
        # sea/document.pyx:254-280); float32 cast at the comparison boundary
        self.idf: dict[str, float] = {}
        n = self.num_documents
        for term, plist in self.index.items():
            df = len(plist)
            idf = math.log((n - df + 0.5) / (df + 0.5))
            self.idf[term] = idf
            for p in plist:
                tf = 0.0
                for f in range(num_fields):
                    denom = 1.0 + self.bm25_bs[f] + (1.0 - self.bm25_bs[f]) * (
                        p.field_lengths[f] / self.avg_field_lengths[f]
                    )
                    tf += p.field_frequencies[f] * self.field_boosts[f] / denom
                p.score = float(
                    np.float32(idf * ((tf * (self.bm25_k + 1.0)) / (tf + self.bm25_k)))
                )

    # ---- query-time posting algebra (sea/posting_list.pyx) ----

    def _leaf(self, term: str) -> list[ResultPosting]:
        return [
            ResultPosting(p.doc_id, p.score, [list(p.positions)], [term])
            for p in self.index.get(term, [])
        ]

    @staticmethod
    def _merge(a: ResultPosting, b: ResultPosting) -> ResultPosting:
        return ResultPosting(
            a.doc_id,
            a.total_score + b.total_score,
            a.char_positions + b.char_positions,
            a.terms + b.terms,
        )

    @classmethod
    def _intersection(cls, a, b):
        out, i, j = [], 0, 0
        while i < len(a) and j < len(b):
            if a[i].doc_id < b[j].doc_id:
                i += 1
            elif a[i].doc_id > b[j].doc_id:
                j += 1
            else:
                out.append(cls._merge(a[i], b[j]))
                i += 1
                j += 1
        return out

    @staticmethod
    def _phrase_ok(p1: ResultPosting, p2: ResultPosting, k: int) -> bool:
        # consecutive-term window: last merged vector of p1 vs last of p2
        xs, ys = p1.char_positions[-1], p2.char_positions[-1]
        i, j = 0, 0
        while i < len(xs) and j < len(ys):
            d = ys[j] - xs[i]
            if 0 <= d <= k:
                return True
            if xs[i] + k < ys[j]:
                i += 1
            else:
                j += 1
        return False

    @classmethod
    def _intersection_phrase(cls, a, b, k=PHRASE_K):
        out, i, j = [], 0, 0
        while i < len(a) and j < len(b):
            if a[i].doc_id < b[j].doc_id:
                i += 1
            elif a[i].doc_id > b[j].doc_id:
                j += 1
            else:
                if cls._phrase_ok(a[i], b[j], k):
                    out.append(cls._merge(a[i], b[j]))
                i += 1
                j += 1
        return out

    @classmethod
    def _union(cls, a, b):
        out, i, j = [], 0, 0
        while i < len(a) and j < len(b):
            if a[i].doc_id < b[j].doc_id:
                out.append(a[i])
                i += 1
            elif a[i].doc_id > b[j].doc_id:
                out.append(b[j])
                j += 1
            else:
                out.append(cls._merge(a[i], b[j]))
                i += 1
                j += 1
        out.extend(a[i:])
        out.extend(b[j:])
        return out

    @staticmethod
    def _difference(a, b):
        out, i, j = [], 0, 0
        while i < len(a) and j < len(b):
            if a[i].doc_id == b[j].doc_id:
                i += 1
                j += 1
            elif a[i].doc_id < b[j].doc_id:
                out.append(a[i])
                i += 1
            else:
                j += 1
        out.extend(a[i:])
        return out

    # ---- boolean evaluation with lazy NOT (sea/engine.pyx:424-498) ----

    def _eval(self, node: dict) -> tuple[list[ResultPosting], bool]:
        if not node:
            return [], False
        if node["type"] == "token":
            return self._leaf(node["value"]), False
        if node["type"] == "phrase":
            result = self._leaf(node["values"][0])
            for term in node["values"][1:]:
                result = self._intersection_phrase(result, self._leaf(term))
            return result, False

        op = node["operator"]
        if op == "not":
            postings, isnot = self._eval(node["right"])
            return postings, not isnot

        left, lnot = self._eval(node["left"])
        right, rnot = self._eval(node["right"])
        if op == "and":
            if not lnot and not rnot:
                return self._intersection(left, right), False
            if lnot and not rnot:
                return self._difference(right, left), False
            if not lnot and rnot:
                return self._difference(left, right), False
            return self._union(left, right), True
        # op == "or"
        if not lnot and not rnot:
            return self._union(left, right), False
        if lnot and not rnot:
            return self._difference(left, right), True
        if not lnot and rnot:
            return self._difference(right, left), True
        return self._intersection(left, right), True

    def search(self, query: str, top_k: int = 10) -> list[tuple[int, float]]:
        """BM25 boolean search -> [(doc_id, score)] with the contract
        tie-break (score desc, doc_id asc). The top-level NOT flag is
        discarded, as in ``sea/engine.pyx:531-553``."""
        ast = parse_query(query)
        if ast is None:
            return []
        postings, _ = self._eval(ast)
        ranked = sorted(postings, key=lambda p: (-p.total_score, p.doc_id))
        return [(p.doc_id, float(np.float32(p.total_score))) for p in ranked[:top_k]]

    def search_all(self, query: str) -> list[tuple[int, float]]:
        return self.search(query, top_k=1 << 62)
