"""Redirect-chain reconstruction — ordered hop chains from an
unordered edge set.

The reference follows HTTP redirects one hop at a time per URL and
stores (run_id, api_call_id, url, next_url, hop_index) rows
(/root/reference/adscrawler/mitm_ad_parser/network_parsers.py:502-560
`follow_url_redirects` / `get_redirect_chain`;
dbcon/queries.py:1009-1027 reads the chains back).  At crawl scale the
engine instead receives the whole edge set (src_url → dst_url pairs
from fetch Location headers) and must reconstruct every chain — head,
per-node hop index, chain-start/end flags — in O(log L) distributed
rounds, not O(L) sequential hops.

Algorithm: pointer doubling (path contraction).  Every node starts
with a pointer to its predecessor (distance 1) or to itself
(distance 0, chain heads).  Each round joins the pointer table with
itself — pointers jump twice as far — so ``ceil(log2(max_hops))``
self-joins converge every node onto its chain head with the exact hop
count.  Each round is one hash shuffle keyed on the pointer; no
driver-side iteration over rows, no recursion depth proportional to
chain length.

Redirect chains are short (the reference caps at 5 hops), so the
default 4 rounds cover chains of 16 hops; raise ``max_hops`` for
longer path workloads.  Precondition: edges form disjoint simple paths
(each src has at most one dst and vice versa — true of redirect logs
keyed per api_call).  Cycles (a→b, b→a — real redirect logs contain
them, which is why the reference caps following at 5 hops) have no
head to converge onto: such rows, and rows of chains longer than
``max_hops``, come back with ``converged = false`` so callers can
route them to quarantine instead of trusting a truncated hop count;
``chain_final_urls`` excludes them.  Duplicate edge observations (the
same hop seen by many fetches) are deduplicated up front — without
that each doubling round would multiply a node's rows by its
predecessor's duplicate count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chain_hops(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve every node of a disjoint-path edge set to
    ``(node, head, hop_index, is_chain_start, is_chain_end)``.

    ``head`` is the chain's first URL (the clicked URL), ``hop_index``
    the 0-based position — matching the reference's per-hop rows
    (network_parsers.py:555: hop_index increments per followed
    Location header).  ``converged`` is false for cycle members and
    beyond-``max_hops`` nodes (their head/hop_index are truncated
    ancestors, not chain starts)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # initial pointers: dst -> src at distance 1; heads point to
    # themselves at distance 0 (anti-join: nodes with no predecessor)
    preds = e.select(
        F.col("dst").alias("node"), F.col("src").alias("ptr"),
        F.lit(1).alias("dist"),
    )
    heads = nodes.join(
        e.select(F.col("dst").alias("node")), "node", "left_anti"
    ).select("node", F.col("node").alias("ptr"), F.lit(0).alias("dist"))
    p = preds.unionByName(heads)

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    # each round references the previous round TWICE (self-join), so
    # without truncation the logical plan doubles per round (measured:
    # 84 FileScans after 4 rounds).  localCheckpoint materializes each
    # round's ~|nodes| rows and cuts the lineage — no CacheManager
    # entry to leak, the ContextCleaner reclaims the blocks.
    p = p.localCheckpoint(eager=True)
    for _ in range(rounds):
        # jump: follow my pointer's pointer.  Head rows (ptr == node,
        # dist 0) are fixed points, so converged rows stop moving.
        hop = p.select(
            F.col("node").alias("j_node"), F.col("ptr").alias("j_ptr"),
            F.col("dist").alias("j_dist"),
        )
        p = (
            p.join(hop, p["ptr"] == hop["j_node"])
            .select(
                "node",
                F.col("j_ptr").alias("ptr"),
                (F.col("dist") + F.col("j_dist")).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )

    ends = nodes.join(
        e.select(F.col("src").alias("node")), "node", "left_anti"
    ).withColumn("_is_end", F.lit(True))
    # converged iff the final pointer IS a head (a dist-0 self-pointer
    # exists for it).  Cycle members and >max_hops nodes point at a
    # mid-chain ancestor instead.  Deliberately NOT hint-broadcast: the
    # head set is one row per chain, which at crawl scale is O(clicked
    # URLs) — millions to billions of rows that must never be shipped
    # to every executor.  A plain equi-join on ptr shuffles both sides
    # on the key they already carry; AQE still chooses a runtime
    # broadcast when the head set is actually small.
    head_set = heads.select(F.col("node").alias("ptr")).withColumn(
        "_ok", F.lit(True)
    )
    return (
        p.join(ends.select("node", "_is_end"), "node", "left")
        .join(head_set, "ptr", "left")
        .select(
            "node",
            F.col("ptr").alias("head"),
            F.col("dist").alias("hop_index"),
            (F.col("dist") == 0).alias("is_chain_start"),
            F.coalesce(F.col("_is_end"), F.lit(False)).alias("is_chain_end"),
            F.coalesce(F.col("_ok"), F.lit(False)).alias("converged"),
        )
    )


def chain_final_urls(hops: DataFrame) -> DataFrame:
    """Per chain head, the final destination URL and total hop count —
    the `follow_url_redirects` return value (the landing URL a click
    ultimately reaches), computed for every chain at once."""
    finals = hops.filter(
        F.col("is_chain_end") & F.col("converged")
    ).select(
        F.col("head"), F.col("node").alias("final_url"),
        F.col("hop_index").alias("n_hops"),
    )
    return finals
