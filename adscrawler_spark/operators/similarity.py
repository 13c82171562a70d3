"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; the scale paths
are (a) IVF: coarse-quantize by centroid, search only the assigned
cell — here cells are the provided ``label`` column (in production the
centroids come from a k-means fit, same query shape), and (b)
sign-LSH bucketing via deterministic md5-derived hyperplanes.

All float math is double-cast and folded in array order, so results
reproduce bit-for-bit across engines (see plans/benchmarks.py oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dcast(vec_col: str) -> str:
    return f"transform({vec_col}, x -> cast(x as double))"


_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), "
    "(acc, x) -> acc + x)"
)


def cosine(a: str, b: str) -> F.Column:
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus
    (the corpus never shuffles — the right shape when |queries| << |corpus|)."""
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), F.expr(_dcast(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.expr(_dcast(vec_col)).alias("qv")
    )
    sims = corpus.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", cosine("qv", "cv").alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def centroids(emb: DataFrame, cell_col: str = "label",
              vec_col: str = "embedding", decimals: int = 6) -> DataFrame:
    """Per-cell mean vector, rounded so downstream distance math is
    reproducible across engines despite summation-order float drift."""
    ex = emb.select(cell_col, F.posexplode(F.expr(_dcast(vec_col))).alias("pos", "x"))
    per_dim = ex.groupBy(cell_col, "pos").agg(
        F.round(F.avg("x"), decimals).alias("c")
    )
    return per_dim.groupBy(cell_col).agg(
        F.expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").alias(
            "centroid"
        )
    )


def ivf_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", cell_col: str = "label",
) -> DataFrame:
    """IVF search: assign each query to its nearest cell centroid, then
    exact top-k within that cell only.  At 10^10 vectors this turns the
    scan into one partition-pruned cell read per query."""
    cents = centroids(emb, cell_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.expr(_dcast(vec_col)).alias("qv")
    )
    assign_w = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc(cell_col)
    )
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", cell_col, cosine("qv", "centroid").alias("csim"))
        .withColumn("arnk", F.row_number().over(assign_w))
        .filter("arnk = 1")
        .select("query_id", "qv", F.col(cell_col).alias("assigned_cell"))
    )
    corpus = emb.select(
        F.col(cell_col).alias("assigned_cell"),
        F.col(id_col).alias("neighbor_id"),
        F.expr(_dcast(vec_col)).alias("cv"),
    )
    sims = assigned.join(corpus, "assigned_cell").select(
        "query_id", "assigned_cell", "neighbor_id", cosine("qv", "cv").alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def lsh_plane_table(spark, dims: int, n_planes: int, n_tables: int,
                    seed: int = 42) -> DataFrame:
    """(t, p, warr) — ±1 hyperplane weight arrays for `n_tables`
    independent sign-LSH tables of `n_planes` planes each.  Weight for
    (table t, plane p, dim d) is +1 iff the first md5 nibble of
    's|t|p|d' is even — md5 is the one hash every engine computes
    identically, so a DuckDB oracle reproduces the buckets bit-for-bit
    (the xxhash64 variant in ``lsh_buckets`` is Spark-only)."""
    t = spark.range(n_tables).select(F.col("id").alias("t"))
    p = spark.range(n_planes).select(F.col("id").alias("p"))
    warr = F.expr(
        f"transform(sequence(0, {dims - 1}), d -> CASE WHEN "
        f"(instr('0123456789abcdef', substring(md5(concat_ws('|', '{seed}', "
        "cast(t as string), cast(p as string), cast(d as string))), 1, 1)) - 1) "
        "% 2 = 0 THEN cast(1.0 as double) ELSE cast(-1.0 as double) END)"
    )
    return t.crossJoin(p).select("t", "p", warr.alias("warr"))


def lsh_table_buckets(emb: DataFrame, dims: int, n_planes: int = 6,
                      n_tables: int = 6, id_col: str = "vec_id",
                      vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """(vid, t, bucket) — one sign-LSH bucket per vector per table.

    Multi-table banding is the recall knob: a pair is a candidate if it
    collides in ANY table, so recall = 1-(1-p^planes)^tables where
    p = 1 - acos(sim)/pi.  Projections fold the weight array in array
    order (left-to-right), so the sign — hence the bucket — reproduces
    exactly in any engine with an ordered fold.

    Plan shape: the weight model rides a broadcast crossJoin of a
    36-row plane dim (a literal-array formulation was measured SLOWER —
    CreateArray of 64 literals re-allocates per row per fold, while the
    broadcast dim materializes each warr once per plane)."""
    from adscrawler_spark.operators.dedup import spread_if_narrow

    planes = lsh_plane_table(emb.sparkSession, dims, n_planes, n_tables, seed)
    # spread a compact corpus scan before the tables×planes fan-out —
    # it would otherwise project every vector in one task.
    v = spread_if_narrow(emb, id_col).select(
        F.col(id_col).alias("vid"), F.expr(_dcast(vec_col)).alias("v")
    )
    proj = v.crossJoin(F.broadcast(planes)).select(
        "vid", "t", "p", F.expr(_DOT.format(a="v", b="warr")).alias("proj")
    )
    bit = F.when(
        F.col("proj") > 0, F.expr("shiftleft(1, cast(p as int))")
    ).otherwise(F.lit(0))
    return proj.groupBy("vid", "t").agg(F.sum(bit).alias("bucket"))


def lsh_buckets(emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Sign-LSH bucket id per vector: hyperplane p's weight for dim d is
    ±1 by the parity of xxhash64(seed, p, d) — deterministic, engine-
    portable, no stored model.  Near vectors share buckets w.h.p.;
    candidate generation = equi-join on (bucket)."""
    dims = emb.select(F.posexplode(F.expr(_dcast(vec_col))).alias("pos", "x"),
                      F.col(id_col))
    planes = None
    for p in range(n_planes):
        w = F.when(
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), F.col("pos")), F.lit(2)) == 0,
            F.col("x"),
        ).otherwise(-F.col("x"))
        agg = F.sum(w).alias(f"p{p}")
        planes = [agg] if planes is None else planes + [agg]
    proj = dims.groupBy(id_col).agg(*planes)
    bucket = None
    for p in range(n_planes):
        bit = F.when(F.col(f"p{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return proj.select(F.col(id_col), bucket.cast("int").alias("bucket"))
