"""Adversarial bucket skew for the LSH candidate generators: a corpus
where thousands of docs/vectors collapse to ONE signature must produce
a bounded (linear) candidate set, not the |bucket|² blowup — while
keeping every member of the degenerate cluster reachable through
verified links (what connected-component dedup clustering needs)."""

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators.dedup import (
    embedding_near_dup_lsh,
    jaccard_via_minhash,
    minhash_candidates,
    minhash_signatures,
    oversized_buckets,
    word_shingles,
)

N_CLONES = 1000
CAP = 16


@pytest.fixture(scope="module")
def clone_docs(spark):
    """1000 docs with identical text (one shingle set) + 20 distinct."""
    clones = spark.range(N_CLONES).select(
        F.format_string("dup%04d", F.col("id")).alias("doc_id"),
        F.lit("the same boilerplate empty page text repeated here").alias(
            "text"
        ),
    )
    distinct = spark.range(20).select(
        F.format_string("uniq%02d", F.col("id")).alias("doc_id"),
        F.concat(
            F.lit("unique document number "),
            F.col("id").cast("string"),
            F.lit(" with its own words entirely"),
        ).alias("text"),
    )
    return clones.unionByName(distinct)


def _components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), set()).add(n)
    return groups


def test_minhash_candidates_bounded_under_skew(clone_docs):
    sigs = minhash_signatures(word_shingles(clone_docs, n=4))
    cand = minhash_candidates(sigs, bucket_cap=CAP).collect()
    # uncapped would be ~N²/2 = 500k pairs for the clone bucket alone;
    # the chain keeps it linear (≤ one chain per band, deduped)
    assert len(cand) < 5 * N_CLONES
    # every clone still reachable from every other through the chain
    pairs = [(r.doc_a, r.doc_b) for r in cand]
    groups = _components(pairs)
    clone_groups = [g for g in groups.values() if any(m.startswith("dup") for m in g)]
    assert len(clone_groups) == 1
    assert sum(1 for m in clone_groups[0] if m.startswith("dup")) == N_CLONES


def test_oversized_buckets_reports_the_cap(clone_docs):
    sigs = minhash_signatures(word_shingles(clone_docs, n=4))
    over = oversized_buckets(sigs, ["band", "sig"], CAP).collect()
    # all 8 bands of the clone signature blow the cap
    assert len(over) == 8
    assert all(r.bucket_size == N_CLONES for r in over)


def test_jaccard_via_minhash_exact_on_capped_candidates(clone_docs):
    out = jaccard_via_minhash(
        word_shingles(clone_docs, n=4), threshold=0.9, bucket_cap=CAP
    )
    rows = out.collect()
    # chain pairs of identical docs all verify at jaccard 1.0
    assert rows and all(abs(r.jaccard - 1.0) < 1e-12 for r in rows)
    groups = _components([(r.doc_a, r.doc_b) for r in rows])
    clone_groups = [g for g in groups.values() if any(m.startswith("dup") for m in g)]
    assert len(clone_groups) == 1 and len(clone_groups[0]) == N_CLONES


def test_embedding_lsh_bounded_under_skew(spark):
    n = 600
    clones = spark.range(n).select(
        F.col("id").cast("int").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), d -> cast(1.0 / d as float))"
        ).alias("embedding"),
    )
    out = embedding_near_dup_lsh(
        clones, threshold=0.99, dims=16, n_planes=4, n_tables=2,
        bucket_cap=CAP,
    )
    rows = out.collect()
    # identical vectors: every candidate verifies at cosine 1.0, and the
    # candidate count stays linear (2 tables × chain) not n²/2
    assert 0 < len(rows) < 5 * n
    groups = _components([(r.vec_a, r.vec_b) for r in rows])
    assert any(len(g) == n for g in groups.values())
