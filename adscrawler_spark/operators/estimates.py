"""Per-group estimation models (grouped-map applyInPandas surface).

The reference's country-share model (/root/reference/adscrawler/process/
app_metrics_history.py:413-534, ``process_metrics_google``) runs a
pandas per-group pipeline: week-max review counts, "max candidate"
detection (a country reporting ~the global counter), global-fallback
rows zeroed, per-country share of the global counter, and install
estimates scaled by that share.  This module carries the distilled core
of that model (max-candidate → fallback → pct_of_global → estimates;
the US-lookup/bfill refinements are orthogonal polish) as:

* ``country_share_columns`` — the pure-pandas model over one group,
  which doubles as the sequential parity oracle, and
* ``country_share_model`` — the distributed form: ``groupBy(store_app)
  .applyInPandas`` so each app's weekly country matrix is modeled in
  one Arrow batch, the exact partitioning the reference gets from its
  per-hash-bucket loop.

Rounding is floor(x·10^k + 0.5)/10^k everywhere — numpy's banker's
rounding and SQL round() disagree on exact .5 ties, this form is
engine-portable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MAX_CANDIDATE_RATIO = 0.96  # app_metrics_history.py:426
MAX_CANDIDATE_FLOOR = 200  # app_metrics_history.py:427

OUT_SCHEMA = StructType(
    [
        StructField("store_app", IntegerType()),
        StructField("country", IntegerType()),
        StructField("week_start", DateType()),
        StructField("review_count", LongType()),
        StructField("true_review_count", LongType()),
        StructField("pct_of_global", DoubleType()),
        StructField("installs_est", LongType()),
    ]
)


def _round_half_up(x: np.ndarray | pd.Series, decimals: int = 0):
    scale = 10.0**decimals
    return np.floor(np.asarray(x, dtype=float) * scale + 0.5) / scale


def country_share_columns(pdf: pd.DataFrame) -> pd.DataFrame:
    """The per-app model over a (country, week_start) frame with
    review_count and installs columns.  Mirrors app_metrics_history.py:
    422-447 (max candidates, fallback zeroing, grc sum) and 479-487
    (pct_of_global, scaled estimates)."""
    df = pdf.copy()
    # keyed on (store_app, week_start): with one app per call (the
    # per-app grouped-map) store_app is constant and this degenerates
    # to the per-week grouping; with a hash BUCKET of apps per call
    # (country_share_model's bucketed path) the same vectorized code
    # models every app in the batch at once.
    gb = df.groupby(["store_app", "week_start"])
    df["max_reviews"] = gb["review_count"].transform("max")
    df["global_installs"] = gb["installs"].transform("max")
    df["is_max_candidate"] = (
        df["review_count"] >= df["max_reviews"] * MAX_CANDIDATE_RATIO
    ) & (df["max_reviews"] > MAX_CANDIDATE_FLOOR)
    cand_counts = gb["is_max_candidate"].transform("sum")
    df["is_global_fallback"] = df["is_max_candidate"] & (cand_counts > 1)
    df["true_review_count"] = np.where(
        df["is_global_fallback"], 0, df["review_count"]
    )
    # fallback rows contribute 0, so this equals the reference's
    # sum-over-non-fallback local_sums_df join (line 453-459).
    df["grc_summed"] = df.groupby(["store_app", "week_start"])[
        "true_review_count"
    ].transform("sum")
    has_fallback = gb["is_global_fallback"].transform("max")
    global_review_count = np.where(
        has_fallback, df["max_reviews"], df["grc_summed"]
    ).astype(float)
    with np.errstate(divide="ignore", invalid="ignore"):
        pct = df["true_review_count"].to_numpy(dtype=float) / global_review_count
    pct = np.where(np.isfinite(pct), pct, 0.0)
    df["pct_of_global"] = _round_half_up(pct, 4)
    df["installs_est"] = _round_half_up(
        df["global_installs"].to_numpy(dtype=float) * pct
    ).astype("int64")
    df["true_review_count"] = df["true_review_count"].astype("int64")
    return df[
        [
            "store_app",
            "country",
            "week_start",
            "review_count",
            "true_review_count",
            "pct_of_global",
            "installs_est",
        ]
    ]


def country_share_model(
    weekly: DataFrame, buckets: int | None = None
) -> DataFrame:
    """Distributed grouped-map country-share estimation.

    Input columns: store_app int, country int, week_start date,
    review_count long, installs long.

    ``buckets=None``: one Arrow batch per store_app — the natural
    grouped-map shape when groups are large (many weeks × countries
    per app).  With many SMALL groups this pays ~5-10 ms of Python
    dispatch per group (measured: 16k single-row groups → 137 s), so
    pass ``buckets``: apps are hashed into that many buckets and one
    pandas call models a whole bucket vectorized — exactly the
    reference's per-hash-bucket processing loop
    (app_metrics_history.py:413-534 iterates hash buckets, not apps).
    Results are identical (the model is keyed on store_app
    internally).  Size buckets so a bucket's rows fit one Arrow batch
    comfortably (~10^5-10^6 rows)."""
    import pyspark.sql.functions as F

    if buckets is None:
        return weekly.groupBy("store_app").applyInPandas(
            lambda pdf: country_share_columns(pdf), OUT_SCHEMA
        )
    return (
        weekly.withColumn(
            "_b", F.pmod(F.xxhash64("store_app"), F.lit(buckets))
        )
        .groupBy("_b")
        .applyInPandas(
            lambda pdf: country_share_columns(
                pdf.drop(columns=["_b"])
            ),
            OUT_SCHEMA,
        )
    )
