"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup — all as declarative DataFrame compositions
(no Python on the hot path; hashing via built-in md5/xxhash64).

Cross-engine determinism notes (these back the DuckDB oracles in
plans/benchmarks.py): MinHash permutations are md5-salted string
minima; SimHash bits come from md5 nibble parities — both reproduce
bit-for-bit in any engine with a standard md5.

Scale notes: shingle explosion multiplies rows by ~tokens-per-doc; at
10^10 docs the shingle join is the shuffle to watch — LSH bands bound
it to (docs × bands) rows and candidate pairs only, which is the point
of MinHash over the quadratic Jaccard join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def spread_if_narrow(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition on `key` ONLY when the scan has fewer
    partitions than cores — a byte-small corpus (one parquet file)
    would otherwise run a downstream explode/fan-out on one task.
    Wide scans pass through untouched: Spark already sizes splits to
    bytes-per-core, and an unconditional repartition costs a full
    shuffle of the corpus (measured: +40% on the 600k-doc minhash
    workload).  The count is explicit — AQE would coalesce a
    count-less repartition of a small shuffle back to one task."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, F.col(key))


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 4,
                  id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) — distinct word n-grams of the lowercased text.
    Compact scans are spread before the ~200× explode
    (``spread_if_narrow``)."""
    df = spread_if_narrow(df, id_col)
    # let-bind the token array (single-element-transform trick, see
    # rake.py): inlining the split into the slice lambda re-ran the
    # regex split once per generated shingle instead of once per doc
    shingles = (
        f"transform(array(split(lower({text_col}), '\\\\s+')), tk -> "
        f"transform(sequence(1, greatest(size(tk) - {n - 1}, 1)), "
        f"i -> array_join(slice(tk, i, {n}), ' ')))[0]"
    )
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.expr(shingles))).alias("shingle"),
    )


def exact_duplicate_clusters(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    return df.groupBy(F.md5(text_col).alias("content_hash")).agg(
        F.count("*").alias("n_docs"),
        F.min(id_col).alias("representative"),
        F.collect_set(id_col).alias("members"),
    )


def jaccard_pairs(shingles: DataFrame, threshold: float,
                  id_col: str = "doc_id") -> DataFrame:
    """Quadratic-exact n-gram Jaccard pairs over a (id, shingle) table;
    use minhash_candidates first at scale and verify only candidates."""
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("common") * 1.0 / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def minhash_signatures(shingles: DataFrame, bands: int = 8,
                       id_col: str = "doc_id") -> DataFrame:
    """One MinHash per band: min over shingles of md5(shingle|band) —
    md5-salting gives `bands` independent permutations.

    Shape note: the bands× explode looks wasteful but partial (map-
    side) aggregation collapses it to docs×bands rows BEFORE the
    shuffle, and it measurably beats a one-pass 8-wide min aggregation
    (hash-agg with 8 wide states updates slower than 8× narrow rows
    through codegen: 93s vs 127s on the 600k-doc scaling workload)."""
    spark = shingles.sparkSession
    band_df = spark.range(bands).select(F.col("id").alias("band"))
    return (
        shingles.crossJoin(F.broadcast(band_df))
        .groupBy(id_col, "band")
        .agg(F.min(F.md5(F.concat_ws("|", "shingle", "band"))).alias("sig"))
    )


# Bucket-skew cap for LSH candidate generation.  A degenerate hot
# bucket (a million boilerplate/empty docs collapsing to one signature)
# re-introduces the O(|bucket|²) blowup the banding exists to avoid;
# above the cap a bucket emits a *consecutive-pair chain* instead of
# all pairs — O(|bucket|) candidates that keep every member reachable
# from every other through verified links (what dedup clustering
# needs), at the cost of pairwise-similarity completeness *inside* an
# oversized bucket (whose members are near-identical anyway — that is
# why they share a full band signature).
DEFAULT_BUCKET_CAP = 512


def _capped_bucket_pairs(
    rows: DataFrame, bucket_keys: list[str], id_col: str,
    a_name: str, b_name: str, bucket_cap: int | None,
) -> DataFrame:
    """(a, b) candidate pairs per bucket: all pairs for buckets at or
    under ``bucket_cap``, a sorted consecutive-pair chain above it."""
    key_eq = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in bucket_keys]
    cond = key_eq[0]
    for k in key_eq[1:]:
        cond = cond & k
    if bucket_cap is None:
        small = rows
        return (
            small.alias("a")
            .join(small.alias("b"), cond & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(
                F.col(f"a.{id_col}").alias(a_name),
                F.col(f"b.{id_col}").alias(b_name),
            )
            .distinct()
        )
    # explicit width BEFORE the sizing window: the bucket frame is
    # tiny in bytes, so AQE coalesces its exchange to ~2 partitions
    # and the up-to-cap² per-bucket pair fan-out below runs nearly
    # serial (guide §2.5 — the coalesce cannot see the downstream
    # multiplication).  Repartitioning here keeps one exchange: the
    # window and the self-join both reuse the explicit hash
    # partitioning (repartitioning AFTER the window instead was
    # measured slower — it broke the window's sort reuse and paid a
    # second exchange).
    width = rows.sparkSession.sparkContext.defaultParallelism
    rows = rows.repartition(width, *bucket_keys)
    w = Window.partitionBy(*bucket_keys)
    sized = rows.withColumn("_bsz", F.count("*").over(w))
    small = sized.filter(F.col("_bsz") <= bucket_cap).drop("_bsz")
    pairs = (
        small.alias("a")
        .join(small.alias("b"), cond & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias(a_name),
            F.col(f"b.{id_col}").alias(b_name),
        )
    )
    wo = Window.partitionBy(*bucket_keys).orderBy(id_col)
    chain = (
        sized.filter(F.col("_bsz") > bucket_cap)
        .select(
            *bucket_keys,
            F.lag(id_col).over(wo).alias(a_name),
            F.col(id_col).alias(b_name),
        )
        .filter(F.col(a_name).isNotNull())
        .select(a_name, b_name)
    )
    return pairs.unionByName(chain).distinct()


def minhash_candidates(
    signatures: DataFrame, id_col: str = "doc_id",
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Candidate near-dup pairs: any shared (band, sig) bucket; buckets
    above ``bucket_cap`` emit a bounded chain (see DEFAULT_BUCKET_CAP).
    Use ``oversized_buckets`` to report what was capped."""
    return _capped_bucket_pairs(
        signatures, ["band", "sig"], id_col, "doc_a", "doc_b", bucket_cap
    )


def oversized_buckets(
    bucketed: DataFrame, bucket_keys: list[str],
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Buckets whose size exceeds the cap — callers materialize this to
    log what candidate generation degraded to chains (no silent caps)."""
    return (
        bucketed.groupBy(*bucket_keys)
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > bucket_cap)
    )


def simhash16(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash: bit j is the majority over distinct tokens of
    md5-nibble-j parity. Engine-portable (md5 only)."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(text_col), r"[^a-z0-9]+"),
                    lambda t: t != F.lit(""),
                )
            )
        ).alias("token"),
    ).withColumn("h", F.md5("token"))
    bit_sums = toks.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        *[
            F.sum(
                F.expr(f"(instr('{HEX}', substring(h, {j + 1}, 1)) - 1) % 2")
            ).alias(f"s{j}")
            for j in range(16)
        ],
    )
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"s{j}") * 2 > F.col("n_tokens"), F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        sim = bit if sim is None else (sim + bit)
    return bit_sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.9,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine near-dup (brute force; the LSH/IVF scale path
    lives in operators/similarity.py). Double-cast, order-exact fold."""
    # pre-normalize once per vector so each pair costs a single fold
    # (the naive 3-dot formulation is ~3x slower at pair scale); the
    # DuckDB oracle uses the identical normalized formulation so floats
    # match bit-for-bit.
    raw = f"transform({vec_col}, x -> cast(x as double))"
    norm = (
        f"sqrt(aggregate(zip_with({raw}, {raw}, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, x) -> acc + x))"
    )
    v = spread_if_narrow(emb, id_col).select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({raw}, x -> x / {norm})").alias("v"),
    )
    a, b = v.alias("a"), v.alias("b")
    sim = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 as double), "
        "(acc, x) -> acc + x)"
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def jaccard_via_minhash(shingles: DataFrame, threshold: float, bands: int = 8,
                        id_col: str = "doc_id",
                        bucket_cap: int | None = DEFAULT_BUCKET_CAP,
                        one_shot: bool = False) -> DataFrame:
    """The wired scale path for n-gram Jaccard dedup: MinHash banding
    generates candidate pairs (linear in docs×bands), then the exact
    Jaccard is computed ONLY on candidates — never the quadratic
    all-pairs shingle self-join of ``jaccard_pairs``.

    Recall per pair with Jaccard J is 1-(1-J)^bands (0.97 at J=0.35
    with 8 bands); ``jaccard_pairs`` stays available as the exact
    small-n verifier.  Mirrors the reference's weekly-dedup intent
    (/root/reference/adscrawler/process/app_metrics_history.py:1152-1156)
    scaled to document corpora.

    ``one_shot``: opt-in single-composition optimization (the
    attribute_creatives ``persisted`` pattern): the shingle frame is
    consumed FOUR times (signatures, per-doc sizes, both sides of the
    common-shingle join) and each consumer prunes differently, so
    exchange reuse never fires and the tokenize/slice tower re-runs
    per consumer (r7: ~75 executor-CPU-s of repeat tower work at the
    10x profile).  A lazy localCheckpoint materializes it once.
    Leave False for a production DAG that persists shingles to a
    durable table between steps."""
    if one_shot:
        shingles = shingles.localCheckpoint(eager=False)
    sigs = minhash_signatures(shingles, bands, id_col)
    cand = minhash_candidates(sigs, id_col, bucket_cap)
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    sh_a = shingles.select(F.col(id_col).alias("doc_a"), "shingle")
    sh_b = shingles.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("common") * 1.0 / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def embedding_near_dup_lsh(emb: DataFrame, threshold: float = 0.35,
                           dims: int = 64, n_planes: int = 6,
                           n_tables: int = 6, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           seed: int = 42,
                           bucket_cap: int | None = DEFAULT_BUCKET_CAP) -> DataFrame:
    """The wired scale path for embedding near-dup: sign-LSH buckets
    (multi-table banding) generate candidates via an equi-join, then the
    exact normalized cosine verifies candidates only — never the O(n²)
    all-pairs join of ``embedding_near_dup_pairs`` (which stays as the
    exact small-n verifier).

    Candidate volume is sum over buckets of |bucket|²·tables (16×+
    smaller than all-pairs at the bench corpus); recall at cosine s is
    1-(1-p^planes)^tables with p = 1 - acos(s)/π — a tunable
    recall/cost knob (≥0.87 for s≥0.9 with 6 planes × 6 tables; lower
    for mid-similarity pairs by design)."""
    from adscrawler_spark.operators.similarity import lsh_table_buckets

    buckets = lsh_table_buckets(
        emb, dims, n_planes, n_tables, id_col, vec_col, seed
    )
    cand = _capped_bucket_pairs(
        buckets, ["t", "bucket"], "vid", "vec_a", "vec_b", bucket_cap
    )
    # identical normalized-fold formulation to embedding_near_dup_pairs,
    # so verified sims are bit-equal to the brute-force path.  The norm
    # is let-bound via the single-element-transform trick (rake.py):
    # inlined in the division lambda it re-ran the whole
    # sqrt-of-dot-product fold once PER ELEMENT (64x per vector).
    raw = f"transform({vec_col}, x -> cast(x as double))"
    norm = (
        f"sqrt(aggregate(zip_with({raw}, {raw}, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, x) -> acc + x))"
    )
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(
            f"transform(array({norm}), nrm -> "
            f"transform({raw}, x -> x / nrm))[0]"
        ).alias("v"),
    )
    va = v.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"))
    vb = v.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"))
    sim = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 as double), "
        "(acc, x) -> acc + x)"
    )
    # NOTE: the .filter on the aliased sim gets substituted below the
    # Project, so the dot-product fold runs in both Filter and Project
    # — but both inside whole-stage codegen.  Two attempted "evaluate
    # once" rewrites through a Generate barrier both measured SLOWER
    # at the 10x profile (fold inside the generator: 186 -> 583
    # executor-s, interpreted; fold in a child Project under an outer
    # Generate: still ~15% slower end to end), so the codegen'd
    # double evaluation stays.
    return (
        cand.join(va, "vec_a").join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def top_terms(df: DataFrame, group_col: str, text_col: str = "text",
              k: int = 5) -> DataFrame:
    """Frequency top-k terms per group (reference Counter.most_common,
    process_keywords.py:192-193)."""
    toks = df.select(
        group_col,
        F.explode(
            F.filter(
                F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != F.lit("")
            )
        ).alias("term"),
    )
    counts = toks.groupBy(group_col, "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def tfidf_top_terms(df: DataFrame, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc top-k TF-IDF terms (reference TfidfVectorizer analog,
    process_keywords.py:359-373): score = tf * ln(N / df_t)."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != F.lit("")
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    # df_t via a window over the tf rows, NOT a tf⋈(tf→groupBy) self
    # join: the two tf subtrees prune to different column sets, so
    # exchange reuse never fires and the tokenize+tf tower executes
    # twice (see tfidf_ngrams in plans/benchmarks.py for the profile).
    # tf rows are unique per (id, term), so count(*) over the term
    # partition IS countDistinct(id).  The term shuffle this needs is
    # the same one the old join paid; corpus-scale vocabularies stay
    # partitioned, never broadcast.
    scored = (
        tf.withColumn("df_t", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df_t")), 4
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
