"""adscrawler_spark — a from-scratch PySpark-native crawl-frontier +
fetch-scheduler + lake-analytics engine with the query/data-processing
capabilities of ddxv/adscrawler (reference read-only at /root/reference).

Architecture is Spark-first (DataFrame/SQL + Catalyst + Arrow-vectorized
pandas UDFs); nothing is ported from the reference's single-process
Python/Postgres/DuckDB implementation — only its *semantics* are
reproduced (see SURVEY.md for the operator-by-operator mapping).

Subpackages
-----------
functions/   scalar & vectorized column functions (URL canonicalization,
             text cleaning, hashing) — the pandas/Arrow UDF layer.
operators/   relational + crawl operators (ads.txt parse, listing parse,
             frontier priority/claim, URL-seen set, dedup, analytics,
             similarity search, text analysis, multimodal plumbing).
sources/     table layouts, read/write helpers, snapshot/ledger
             (Iceberg-shaped; parquet+manifest in the sandbox).
plans/       derived-table (materialized-view-like) pipelines.
streaming/   the micro-batched crawl generation loop (claim → fetch →
             parse → commit) and the deterministic fetch simulator.
pyref/       pure-Python reference implementations used ONLY by the
             parity test-suite (golden oracle, never on the hot path).
"""

__version__ = "0.1.0"
