"""Interactive serving REPL — parity with the reference's serve loop
(``sea/main.py:52-131``): load the engine once, then answer queries in
exact / semantic / combined mode with an LTR toggle, plus the Spark-side
extensions the reference doesn't have (cursor pagination, metadata
filters, facet sidebars, maintenance status).

    python jobs/serve.py --index /path/idx [--corpus c.parquet]
        [--embeddings e.parquet] [--ltr-weights w.npz] [--cores 8]

Commands at the prompt (any other line is a query):
    mode:exact | mode:semantic | mode:combined   select search mode
    enable:ltr | disable:ltr                     toggle the re-ranker
    topk:N                                       result page size
    filter:<sql-predicate> | filter:off          metadata filter (needs --corpus)
    facet:<column> | facet:off                   facet counts per query (needs --corpus)
    stats:<column> | stats:off                   numeric stats agg per query (needs --corpus)
    mmr:<lambda> | mmr:off                       MMR diversification (semantic mode)
    next                                         next page of the last query
    count:<query>                                match count, no ranking
    explain:<doc_id> <query>                     per-term score breakdown
    mlt:<doc_id>                                 more-like-this from a seed doc
    sig:<query>                                  significant terms (JLH)
    syn:{"term": ["alt"]} <query>                query-time synonym expansion
    rescore:<phrase> :: <query>                  two-phase proximity rescore
    status                                       index maintenance state
    refresh                                      re-read deltas/tombstones
    auto                                         policy tick: merge/compact if thresholds crossed, then refresh
    exit

Semantic/combined modes embed the query with the deterministic
feature-hash embedder (``hash_embed_text``) — pair them with a corpus
embedded by ``text_analysis.hash_embeddings`` (the honest stand-in for
a learned model, which this environment doesn't ship; the reference
loads a sentence-transformer at ``sea/engine.pyx:161-176``)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs_search_engine_architecture_spark.engine import SearchEngine  # noqa: E402
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402


def _print_rows(rows, corpus_text: dict | None) -> None:
    for r in rows:
        d = r.asDict()
        doc_id = d.pop("doc_id")
        fields = "  ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in d.items()
        )
        line = f"  #{doc_id}  {fields}"
        if corpus_text and doc_id in corpus_text:
            line += f"  | {corpus_text[doc_id][:80]}"
        print(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--embeddings", default=None)
    ap.add_argument("--ltr-weights", default=None)
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="spark-sea-serve",
        master=f"local[{args.cores}]" if args.cores else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    eng = SearchEngine(spark, args.index)
    corpus = spark.read.parquet(args.corpus) if args.corpus else None
    # normalize a custom --doc-id-col corpus once at load: every REPL
    # surface (text preview, facets, stats, filtered search) keys the
    # corpus on a literal doc_id column
    id_col = eng.meta.get("doc_id_col", "doc_id")
    if corpus is not None and id_col != "doc_id" and id_col in corpus.columns:
        corpus = corpus.withColumnRenamed(id_col, "doc_id")
    emb = spark.read.parquet(args.embeddings) if args.embeddings else None
    print(f"loaded in {(time.time() - t0) * 1000:.1f} ms")

    mode, ltr_on, top_k = "exact", False, 10
    filt: str | None = None
    facet: str | None = None
    stats_col: str | None = None
    last_query: str | None = None
    mmr_lam: float | None = None
    cursor = None
    while True:
        try:
            line = input(f"({mode}{'+ltr' if ltr_on else ''}) search: ")
        except EOFError:
            break
        line = line.strip()
        if not line:
            continue
        low = line.lower()
        if low == "exit":
            break
        if low.startswith("mode:"):
            want = low.split(":", 1)[1]
            if want not in ("exact", "semantic", "combined"):
                print("- modes: exact, semantic, combined")
                continue
            if want in ("semantic", "combined") and emb is None:
                print("- semantic modes need --embeddings")
                continue
            if want == "combined" and not ltr_on and args.ltr_weights:
                ltr_on = True
                # same cursor hazard enable:ltr guards against — a
                # later mode:exact + 'next' must not continue an
                # unreranked walk under a '+ltr' prompt
                cursor = None
                print("- enabled ltr (combined mode reranks)")
            mode = want
            print(f"- switched to {mode}")
            continue
        if low == "enable:ltr":
            if not args.ltr_weights:
                print("- no --ltr-weights given")
                continue
            ltr_on = True
            # kill any in-flight page walk: 'next' would otherwise pass
            # the guard and silently continue an UNreranked BM25 cursor
            # walk under a '+ltr' prompt
            cursor = None
            print("- ltr enabled")
            continue
        if low == "disable:ltr":
            ltr_on = False
            if mode == "combined":
                mode = "exact"
                print("- combined needs ltr; back to exact")
            print("- ltr disabled")
            continue
        if low.startswith("topk:"):
            try:
                top_k = max(1, int(low.split(":", 1)[1]))
            except ValueError:
                print("- topk wants an integer, e.g. topk:20")
                continue
            cursor = None  # page size changed — walk restarts fresh
            print(f"- top_k = {top_k}")
            continue
        if low.startswith("filter:"):
            pred = line.split(":", 1)[1].strip()
            if pred.lower() == "off":
                filt = None
                cursor = None  # filter context changed — walk restarts
                print("- filter off")
            elif corpus is None:
                print("- filters need --corpus")
            else:
                filt = pred
                cursor = None
                print(f"- filter: {filt}")
            continue
        if low.startswith("mmr:"):
            arg = low.split(":", 1)[1].strip()
            if arg == "off":
                mmr_lam = None
                print("- mmr off")
                continue
            try:
                lam = float(arg)
            except ValueError:
                print("- mmr wants a lambda in [0,1] or off, e.g. mmr:0.7")
                continue
            if not 0.0 <= lam <= 1.0:
                print("- mmr lambda must be in [0,1]")
                continue
            mmr_lam = lam
            print(f"- mmr diversification on (lambda={lam}; "
                  "applies in semantic mode)")
            continue
        if low.startswith("facet:"):
            col = line.split(":", 1)[1].strip()
            if col.lower() == "off":
                facet = None
                print("- facets off")
            elif corpus is None:
                print("- facets need --corpus")
            else:
                facet = col
                print(f"- facet column: {facet}")
            continue
        if low.startswith("stats:"):
            col = line.split(":", 1)[1].strip()
            if col.lower() == "off":
                stats_col = None
                print("- stats off")
            elif corpus is None:
                print("- stats need --corpus")
            elif not col:
                print("- usage: stats:<numeric column> | stats:off")
            else:
                stats_col = col
                print(f"- stats column: {stats_col}")
            continue
        if low.startswith("count:"):
            q = line.split(":", 1)[1].strip()
            if not q:
                print("- usage: count:<query>")
                continue
            print(f"- total hits: {eng.count(q)}")
            continue
        if low.startswith("explain:"):
            # explain:<doc_id> <query> — per-term score breakdown
            rest = line.split(":", 1)[1].strip()
            try:
                did_s, q = rest.split(None, 1)
                did = int(did_s)
            except ValueError:
                print("- usage: explain:<doc_id> <query>")
                continue
            import json as _json

            print(_json.dumps(eng.explain_score(q, did)))
            continue
        if low.startswith("mlt:"):
            # mlt:<doc_id> — more-like-this from a seed doc
            rest = line.split(":", 1)[1].strip()
            try:
                seed = int(rest)
            except ValueError:
                print("- usage: mlt:<doc_id>")
                continue
            try:
                # corpus=None -> update-aware current_corpus() fetches
                # the seed's CURRENT text (the static --corpus parquet
                # would serve a stale row after in-place updates);
                # the active filter restricts the RESULTS (predicate
                # evaluates on current_corpus = the source columns)
                rows = eng.more_like_this(
                    seed, top_k=top_k, predicate=filt
                ).collect()
            except Exception as exc:
                print(f"- more_like_this failed: {type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:200]}")
                continue
            _print_rows(rows, None)
            continue
        if low.startswith("sig:"):
            q = line.split(":", 1)[1].strip()
            if not q:
                print("- usage: sig:<query>")
                continue
            try:
                # foreground = query ∩ active filter; background
                # stays the whole index (ES filtered-sigterms shape)
                rows = eng.significant_terms(
                    q, corpus, top_n=10, predicate=filt
                ).collect()
            except Exception as exc:
                print(f"- significant_terms failed: "
                      f"{type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:200]}")
                continue
            for r in rows:
                print(f"  {r['term']:<20} fg={r['fg_count']:<6} "
                      f"score={r['score']:.6f}")
            continue
        if low.startswith("syn:"):
            # syn:{"term": ["alt", ...]} <query> — one-shot query-time
            # synonym expansion (term leaves become OR groups)
            import json as _json

            rest = line.split(":", 1)[1].strip()
            try:
                syn, idx = _json.JSONDecoder().raw_decode(rest)
                q = rest[idx:].strip()
                if not isinstance(syn, dict) or not q:
                    raise ValueError
            except (ValueError, _json.JSONDecodeError):
                print('- usage: syn:{"term": ["alt", ...]} <query>')
                continue
            t0 = time.time()
            try:
                rows = eng.synonym_search(q, syn, top_k=top_k).collect()
            except Exception as exc:
                print(f"- synonym query failed: {type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:200]}")
                continue
            _print_rows(rows, None)
            print(f"- {len(rows)} rows in "
                  f"{(time.time() - t0) * 1000:.1f} ms")
            continue
        if low.startswith("rescore:"):
            # rescore:<proximity phrase> :: <query> — ES-style two-phase
            # rescore of the query's top-100 window (slop 10, total)
            rest = line.split(":", 1)[1]
            if "::" not in rest:
                print("- usage: rescore:<proximity phrase> :: <query>")
                continue
            phrase, q = (s.strip() for s in rest.split("::", 1))
            if not phrase or not q:
                print("- usage: rescore:<proximity phrase> :: <query>")
                continue
            t0 = time.time()
            try:
                rows = eng.rescore_search(q, phrase, top_k=top_k).collect()
            except Exception as exc:
                print(f"- rescore failed: {type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:200]}")
                continue
            _print_rows(rows, None)
            print(f"- {len(rows)} rows in "
                  f"{(time.time() - t0) * 1000:.1f} ms")
            continue
        if low == "status":
            import json as _json

            from cs_search_engine_architecture_spark.operators import indexer

            print(_json.dumps({
                "num_postings": eng.meta.get("num_postings"),
                "tombstones": eng._num_tombstones(),
                "updated_docs": eng._num_updated(),
                "delta_segments": len(indexer.load_delta_metas(eng.index_path)),
            }))
            continue
        if low == "refresh":
            eng.refresh()
            cursor = None  # maintenance may reorder pages — walk restarts
            print("- refreshed")
            continue
        if low == "auto":
            import json as _json

            from cs_search_engine_architecture_spark.operators import indexer

            try:
                out = indexer.auto_maintain(spark, eng.index_path)
            except Exception as exc:
                print(f"- auto-maintain failed: {type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:200]}")
                continue
            if out["actions"]:
                eng.refresh()
                cursor = None
            print(_json.dumps(
                {"actions": out["actions"], "after": out["after"]}
            ))
            continue
        if low == "next":
            # 'next' continues an exact-mode page walk (filtered or
            # not); after an LTR page it would silently restart an
            # UNreranked BM25 walk, so LTR toggles reset the cursor and
            # the guard refuses until a fresh query
            if last_query is None or mode != "exact" or cursor is None:
                print("- pagination follows an exact-mode query "
                      "(ltr off)")
                continue
            query = last_query
        else:
            query, cursor = line, None
            last_query = line

        t0 = time.time()
        paged = False
        try:
            rows, paged, cursor = _run_query(
                eng, emb, mode, query, low, top_k, filt, cursor, ltr_on,
                corpus, args, mmr_lam=mmr_lam,
            )
        except KeyboardInterrupt:
            raise
        except Exception as exc:  # bad predicate/column/query — keep serving
            print(f"- query failed: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}")
            continue
        took = (time.time() - t0) * 1000

        text_map = None
        if corpus is not None and rows:
            ids = [r["doc_id"] for r in rows]
            tcol = next(
                (c for c in corpus.columns if c in ("text", "content")), None
            )
            if tcol:
                text_map = {
                    r["doc_id"]: r[tcol]
                    for r in corpus.where(
                        corpus["doc_id"].isin(ids)
                    ).select("doc_id", tcol).collect()
                }
        _print_rows(rows, text_map)
        if not rows and mode == "exact" and low != "next":
            # zero hits: advisory 'did you mean' from the k-gram index
            # (the reference's spelling surface, sea/engine.pyx:526-529)
            try:
                corrected, changed = eng.suggest(query)
                if changed:
                    print(f"- did you mean: {corrected}")
            except Exception:
                pass
        if facet is not None and mode == "exact":
            try:
                # facets respect the active filter context (sidebar
                # counts = query ∩ filters, like every search UI)
                fc = eng.facet_counts(
                    query, corpus, facet, top_n=8, predicate=filt
                ).collect()
                print("  facets: " + ", ".join(
                    f"{r['facet']}={r['doc_count']}" for r in fc
                ))
            except Exception as exc:
                print(f"- facet failed: {str(exc).splitlines()[0][:120]}")
        if stats_col is not None and mode == "exact":
            try:
                # stats respect the active filter context, like facets
                st = eng.stats_agg(
                    query, corpus, stats_col, predicate=filt
                ).collect()[0]
                avg = "n/a" if st["avg"] is None else f"{st['avg']:.4f}"
                pctl = {
                    r["quantile"]: r["value"]
                    for r in eng.percentiles_agg(
                        query, corpus, stats_col, qs=(0.5, 0.95),
                        predicate=filt,
                    ).collect()
                }
                print(
                    f"  stats[{stats_col}]: count={st['count']} "
                    f"min={st['min']} max={st['max']} sum={st['sum']} "
                    f"avg={avg} distinct={st['distinct']} "
                    f"p50={pctl.get(0.5)} p95={pctl.get(0.95)}"
                )
            except Exception as exc:
                print(f"- stats failed: {str(exc).splitlines()[0][:120]}")
        print(f"- {len(rows)} rows in {took:.1f} ms"
              + ("  (type 'next' for more)" if paged else ""))

    spark.stop()


def _run_query(eng, emb, mode, query, low, top_k, filt, cursor, ltr_on,
               corpus, args, mmr_lam=None):
    """One query execution — returns (rows, paged, cursor)."""
    from cs_search_engine_architecture_spark.operators.text_analysis import (
        hash_embed_text as _embed,
    )

    paged = False
    if mode == "exact":
        if ltr_on and low != "next":
            if filt is not None:
                # filter selects candidates (filter context), LTR
                # re-ranks them — neither surface is silently dropped
                cand = eng.filtered_search(
                    query, corpus, filt, top_k=max(50, top_k)
                )
                res = eng.search_ltr(
                    query, top_k, ltr_weights=args.ltr_weights,
                    candidates=cand,
                )
            else:
                res = eng.search(
                    query, top_k, ltr_enabled=True,
                    ltr_weights=args.ltr_weights,
                )
        elif filt is not None:
            # filter-context scores are the unfiltered scores, so the
            # cursor's total order partitions the filtered set exactly
            res = eng.filtered_search(
                query, corpus, filt, top_k, cursor=cursor
            )
            paged = True
        else:
            res = eng.search_after(query, cursor=cursor, top_k=top_k)
            paged = True
        rows = res.collect()
        if paged and rows:
            cursor = (rows[-1]["score"], rows[-1]["doc_id"])
    elif mode == "semantic":
        emb_q = emb
        if filt is not None:
            # the active filter is a CORPUS predicate; restrict the
            # embeddings to the admitted ids BEFORE the top-k (the
            # filter-context convention — semantic_search's own
            # predicate= evaluates over embedding-table columns, which
            # don't carry the corpus metadata)
            from pyspark.sql import functions as F

            emb_q = emb.join(
                eng._allowed_ids(corpus, filt).select(
                    F.col("doc_id").alias("vec_id")
                ),
                "vec_id",
                "left_semi",
            )
        if mmr_lam is not None:
            rows = eng.semantic_search_mmr(
                emb_q, _embed(query), top_k,
                candidate_k=max(50, 5 * top_k), lam=mmr_lam,
            ).collect()
        else:
            rows = eng.semantic_search(emb_q, _embed(query), top_k).collect()
    else:
        # corpus=/predicate= restrict BOTH hybrid arms (filter context);
        # no-ops when no filter is active
        rows = eng.combined_search(
            query, emb, _embed(query), top_k,
            ltr_weights=args.ltr_weights if ltr_on else None,
            corpus=corpus if filt is not None else None,
            predicate=filt,
        ).collect()
    return rows, paged, cursor


if __name__ == "__main__":
    main()
