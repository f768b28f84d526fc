"""Long-lived interactive serving over the cached index.

The reference is, end to end, a served app: a Streamlit loop that
takes a query, scores it against pre-built index frames, and prints
top-10 results with truncated document text
(/root/reference/pyapp.py:82-121; devcontainer runs
`streamlit run pyapp.py`). This module is that user experience on the
Spark engine without the Streamlit dependency: build + cache the
index ONCE at startup (the reference's offline-build /
interactive-query architecture), then answer queries from the warm
cache — as a stdlib-only HTTP JSON endpoint and/or a terminal REPL.

Serving path per query: tokenize driver-side (tiny), prune the tf
scan with an IN-list filter, 3-way join + broadcast params, top-k via
TakeOrderedAndProject, ONE snippet join (not the reference's N+1
per-hit collect loop — pyapp.py:110-114), literal highlight. All
reused from index/bm25.py; nothing here adds plan surface.

Usage:
    python -m searchengine_spark.serve --sf-dir /root/testdata/sf0.01 --port 8765
    python -m searchengine_spark.serve --sf-dir ... --repl
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession

# Upper bound on requested result-list size for both HTTP endpoints:
# k drives a post-limit collect, so an unbounded k is an unbounded
# driver materialization — clamp, don't trust the client.
MAX_K = 100


class SearchService:
    """Build-once/query-many façade over the index + serving helpers."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        *,
        stem: bool = False,
        snippet_len: int = 200,
        multilingual: bool = False,
    ) -> None:
        from searchengine_spark.index.builder import build_index
        from searchengine_spark.io import load_table

        self._spark = spark
        self._stem = stem
        self._snippet_len = snippet_len
        self._multilingual = multilingual
        self._docs = load_table(spark, sf_dir, "documents")
        # Serving cache at few partitions: interactive queries are
        # task-scheduling-bound (see InvertedIndex.coalesce) — 2x
        # lower per-query latency than the build-parallel layout.
        if multilingual:
            if stem:
                raise ValueError(
                    "stem applies to the English Porter pipeline; the "
                    "multilingual index routes per-language instead"
                )
            # Language-routed index (text/multilingual.py): NFC +
            # langid + per-language stopwords + CJK bigrams. Snippets
            # still render from the ORIGINAL text — normalization is
            # a matching key, not a display rewrite.
            from pyspark.sql import functions as F

            from searchengine_spark.text.multilingual import routed_frame

            routed = routed_frame(self._docs).select("doc_id", "words")
            self._index = (
                build_index(routed, tokens=F.col("words"))
                .coalesce(4)
                .cache()
            )
        else:
            self._index = build_index(self._docs, stem=stem).coalesce(4).cache()
        # embeddings power /similar; optional in custom datasets
        import os

        from searchengine_spark.io import table_path

        self._emb = None
        if os.path.exists(table_path(sf_dir, "embeddings")):
            self._emb = (
                load_table(spark, sf_dir, "embeddings").coalesce(4).cache()
            )
        # Materialize the cache before the first user query so first-hit
        # latency is query cost, not index build (the reference pays its
        # 1-2 min cold start inside the first Streamlit interaction).
        self._index.scoring_params.collect()

    def query(
        self, q: str, k: int = 10, *, fuzzy: bool = False
    ) -> list[dict[str, Any]]:
        """Top-k hits with highlighted snippets, as plain dicts.

        ``fuzzy``: query terms missing from the vocabulary are
        replaced by their closest in-vocabulary suggestion (distance
        then doc_freq) before scoring — typo tolerance the reference
        lacks (its unknown terms silently contribute nothing)."""
        from searchengine_spark.index.bm25 import highlight, search, snippets

        highlight_terms = [q]
        if self._multilingual:
            if fuzzy:
                raise ValueError(
                    "fuzzy correction is vocabulary-keyed to the English "
                    "pipeline; not combinable with the routed index"
                )
            from searchengine_spark.text.multilingual import (
                routed_query_terms,
            )

            terms = routed_query_terms(q)
            hits = search(self._index, terms, k=k)
            # every routed term (CJK bigrams included) is a literal
            # substring of the original text, so highlight matches it
            highlight_terms = terms
        elif fuzzy:
            from searchengine_spark.index.phrase import search_with_correction
            from searchengine_spark.text.tokenizer import tokenize_query

            hits, corrections = search_with_correction(
                self._index, q, k=k, stem=self._stem
            )
            # Highlight the terms actually SEARCHED, each on its own:
            # a raw substring rewrite of q would miss case variants
            # ('Sparkk' vs the lowercased correction key) and corrupt
            # words that merely contain the typo as a substring.
            highlight_terms = [
                corrections.get(t, t)
                for t in tokenize_query(q, stem=self._stem)
                if corrections.get(t, t) is not None
            ]
        else:
            hits = search(self._index, q, k=k, stem=self._stem)
        rows = (
            highlight(
                snippets(hits, self._docs, max_len=self._snippet_len),
                "snippet",
                highlight_terms,
            )
            .collect()  # k rows, post-limit — the only driver collect
        )
        return [
            {
                "doc_id": r["doc_id"],
                "total_score": round(float(r["total_score"]), 6),
                "snippet": r["snippet"],
            }
            for r in rows
        ]


    def similar(
        self, doc_id: int, q: str | None = None, k: int = 10
    ) -> list[dict[str, Any]]:
        """More-like-this: embedding neighbors of ``doc_id``, optionally
        RRF-fused with a BM25 keyword list (index/hybrid.py) — "find
        docs like this one, about <terms>". Brute cosine is the right
        serving shape at cached-table scale; at 100 TB swap the
        semantic list for the IVF probe (operators/ann.py) — the
        fusion contract is rank lists, so nothing else changes."""
        from pyspark.sql import functions as F

        from searchengine_spark.index.bm25 import search, snippets
        from searchengine_spark.index.hybrid import FUSE_N, _ranked, rrf_fuse
        from searchengine_spark.operators.similarity import cosine_expr

        if self._emb is None:
            raise ValueError("no embeddings table in this dataset")
        qv = self._emb.filter(F.col("vec_id") == doc_id).select(
            F.col("embedding").alias("qvec")
        )
        if not qv.take(1):
            raise ValueError(f"unknown doc_id {doc_id}")
        sem_scores = (
            self._emb.filter(F.col("vec_id") != doc_id)
            .crossJoin(F.broadcast(qv))
            .select(
                F.col("vec_id").alias("doc_id"),
                F.round(
                    cosine_expr(F.col("embedding"), F.col("qvec")), 6
                ).alias("cosine"),
            )
        )
        lists = [_ranked(sem_scores, "cosine", "doc_id", FUSE_N)]
        if q:
            lists.append(
                _ranked(
                    search(self._index, q, k=FUSE_N, stem=self._stem),
                    "total_score",
                    "doc_id",
                    FUSE_N,
                )
            )
        fused = (
            rrf_fuse(lists)
            .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
            .limit(k)
        )
        rows = snippets(
            fused.withColumn("total_score", F.col("rrf_score")),
            self._docs,
            max_len=self._snippet_len,
        ).collect()
        return [
            {
                "doc_id": r["doc_id"],
                "rrf_score": round(float(r["total_score"]), 6),
                "snippet": r["snippet"],
            }
            for r in rows
        ]


def make_http_server(service: SearchService, port: int = 0):
    """stdlib ThreadingHTTPServer: GET /search?q=...&k=10 -> JSON hits;
    GET /healthz -> ok. Returns the (not yet serving) server object so
    callers control the serve_forever lifecycle (tests run it in a
    thread; __main__ blocks on it)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self) -> None:  # noqa: N802 — http.server API
            url = urlparse(self.path)
            if url.path == "/healthz":
                self._reply(200, {"status": "ok"})
                return
            if url.path == "/similar":
                params = parse_qs(url.query)
                try:
                    doc_id = int((params.get("doc_id") or [""])[0])
                except ValueError:
                    self._reply(400, {"error": "doc_id must be an integer"})
                    return
                # parse/validate k BEFORE the serving try: a malformed k
                # is a client error (400), never a 500
                try:
                    k = int((params.get("k") or ["10"])[0])
                except ValueError:
                    self._reply(400, {"error": "k must be an integer"})
                    return
                if k < 1:
                    self._reply(400, {"error": "k must be >= 1"})
                    return
                k = min(k, MAX_K)  # bounded collect is the serving contract
                q = (params.get("q") or [None])[0]
                try:
                    self._reply(
                        200,
                        {
                            "doc_id": doc_id,
                            "results": service.similar(doc_id, q=q, k=k),
                        },
                    )
                except ValueError as exc:
                    # unknown doc_id (or a dataset without embeddings):
                    # the resource does not exist — 404, not 500
                    self._reply(404, {"error": str(exc)[:300]})
                except Exception as exc:  # noqa: BLE001 — keep serving
                    self._reply(
                        500, {"error": f"{type(exc).__name__}: {exc}"[:300]}
                    )
                return
            if url.path != "/search":
                self._reply(
                    404, {"error": "unknown path; use /search?q=... or /similar?doc_id=..."}
                )
                return
            params = parse_qs(url.query)
            q = (params.get("q") or [""])[0]
            try:
                k = int((params.get("k") or ["10"])[0])
            except ValueError:
                self._reply(400, {"error": "k must be an integer"})
                return
            if k < 1:
                self._reply(400, {"error": "k must be >= 1"})
                return
            k = min(k, MAX_K)
            if not q:
                self._reply(400, {"error": "missing query parameter q"})
                return
            fuzzy = (params.get("fuzzy") or ["0"])[0] in ("1", "true", "yes")
            try:
                self._reply(
                    200,
                    {"query": q, "results": service.query(q, k=k, fuzzy=fuzzy)},
                )
            except Exception as exc:  # noqa: BLE001 — a bad query must not kill the server
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"[:300]})

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args) -> None:  # quiet test output
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def repl(service: SearchService) -> None:
    """Terminal loop mirroring the Streamlit input->results flow."""
    while True:
        try:
            q = input("search> ").strip()
        except EOFError:
            return
        if q in ("", ":q", "exit", "quit"):
            return
        for hit in service.query(q):
            print(f"doc {hit['doc_id']:>8}  score {hit['total_score']:.4f}  {hit['snippet'][:120]}")


def main() -> None:
    import argparse

    from searchengine_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--stem", action="store_true")
    ap.add_argument("--repl", action="store_true")
    ap.add_argument(
        "--multilingual",
        action="store_true",
        help="serve the language-routed index (NFC + langid + "
        "per-language stopwords + CJK bigrams)",
    )
    args = ap.parse_args()

    spark = get_spark("searchengine-serve")
    service = SearchService(
        spark, args.sf_dir, stem=args.stem, multilingual=args.multilingual
    )
    if args.repl:
        repl(service)
    else:
        server = make_http_server(service, port=args.port)
        print(f"serving on http://127.0.0.1:{server.server_address[1]}/search?q=...")
        server.serve_forever()


if __name__ == "__main__":
    main()
