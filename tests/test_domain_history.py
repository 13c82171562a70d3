"""Hand-computed cases for the parent-company rollup hop
(reference dbcon/sql/duckdb/trend_parent_companies.sql:1-13,115-126 via
plans/domain_history.py::parent_rollup_mapping / attach_company_domain).
The full windowed trend pipeline is oracle-checked in
tests/test_oracle_queries.py (``trend_parent_companies``); these pin
the two joins' edge semantics directly."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from adscrawler_spark.plans import domain_history as domhist


def test_parent_rollup_coalesce(spark):
    # company 1 has parent 9; company 2 is parentless (NULL); company 3
    # is absent from the companies dim entirely — both of the latter
    # must roll up to themselves.
    cmap = spark.createDataFrame(
        [Row(domain_id=10, company_id=1),
         Row(domain_id=11, company_id=2),
         Row(domain_id=12, company_id=3)]
    )
    companies = spark.createDataFrame(
        [Row(id=1, domain_id=100, parent_company_id=9),
         Row(id=2, domain_id=101, parent_company_id=None)]
    )
    out = {
        (r.domain_id, r.company_id)
        for r in domhist.parent_rollup_mapping(cmap, companies).collect()
    }
    assert out == {(10, 9), (11, 2), (12, 3)}


def test_attach_company_domain_null_paths(spark):
    # entity 9 → company row with domain 200 → 'acme'; entity 2 →
    # company row whose domain_id is NULL; entity 7 → no company row.
    # Both null paths keep their stats with company_domain NULL.
    trends = spark.createDataFrame(
        [Row(domain_id=9, year=2024, total_apps=5),
         Row(domain_id=2, year=2024, total_apps=3),
         Row(domain_id=7, year=2023, total_apps=1)]
    )
    companies = spark.createDataFrame(
        [(9, 200, None), (2, None, None)],
        "id int, domain_id int, parent_company_id int",
    )
    domains = spark.createDataFrame(
        [Row(id=200, domain_name="acme")]
    )
    out = domhist.attach_company_domain(trends, companies, domains)
    assert out.columns == ["company_domain", "year", "total_apps"]
    rows = {
        (r.company_domain, r.year, r.total_apps) for r in out.collect()
    }
    assert rows == {("acme", 2024, 5), (None, 2024, 3), (None, 2023, 1)}


def test_parent_rollup_plan_broadcasts(spark):
    cmap = spark.createDataFrame(
        [Row(domain_id=10, company_id=1)]
    )
    companies = spark.createDataFrame(
        [Row(id=1, domain_id=100, parent_company_id=9)]
    )
    plan = (
        domhist.parent_rollup_mapping(cmap, companies)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
