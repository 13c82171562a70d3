"""Sequential single-threaded crawl-scheduler oracle.

Replays the engine's generation loop (claim → robots → lanes/budget →
fetch → parse → discover → fold) over the same frontier rows with
plain Python data structures.  The north_rule's global invariant —
"crawl ordering and final URL-seen set must match the reference under
the same seed list and politeness budget" — is checked by comparing
this oracle's claim log / seen set / frontier states against the Spark
job's committed tables (tests/test_crawl_job.py).

Hash inputs (url_hash, url_hash64, row_hash64) come from the collected
frontier rows (JVM-computed), so the oracle shares no Spark code — it
shares only the deterministic response generator (streaming/synth.py)
and data constants, by design.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

from adscrawler_spark.pyref import adstxt as py_adstxt
from adscrawler_spark.streaming import synth

from adscrawler_spark.streaming.frontier_gen import HOT_IOS, HOT_PLAY

HOT_HOSTS = {HOT_PLAY, HOT_IOS}
NEVER_CRAWLED_DAYS = 36_500
EPOCH = datetime(2026, 8, 2, 0, 0, 0)


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    if slash < 0:
        return ""
    return rest[slash:].split("?", 1)[0].split("#", 1)[0]


@dataclass
class SimConfig:
    listing_batch: int = 2_000
    adstxt_batch: int = 2_000
    rankings_batch: int = 100
    budget_seconds: float = 3_600.0
    # shared data constant (operators/frontier.py HOT_LANES) — the
    # per-host fetch-concurrency budget; must match the engine's.
    hot_lanes: int = 32
    default_crawl_delay: float = 0.5
    robots: dict[str, tuple[list[str], float]] = field(default_factory=dict)
    # robots: host -> (disallow path prefixes, crawl_delay)
    # canon -> (url_hash, url_hash64, row_hash64) for URLs not in the
    # seed frontier (discoveries); JVM-computed by the test harness.
    hash_lookup: dict[str, tuple[int, int, int]] = field(default_factory=dict)


@dataclass
class SimState:
    frontier: list[dict]
    seen: set[str]
    claim_log: list[tuple[int, str, int, str]]  # (gen, family, rank, canon)
    docs: set[str]
    crawl_results: dict[str, int]
    doc_countries: dict[str, str | None] = field(default_factory=dict)
    # (store, date, country, collection, category, rank, store_id)
    rankings: set[tuple] = field(default_factory=set)
    ranking_keys: set[tuple] = field(default_factory=set)


def _doc_country(row: dict, h: int) -> str | None:
    """Expected document country: Play resolves the developer address
    (P11) and falls back to the storefront crawl country; iOS IS its
    storefront; ads.txt has none (scrape_stores.py:991-1050 analog)."""
    kind = row["doc_kind"]
    if kind == "adstxt":
        return None
    if kind == "listing_play":
        import json as _json

        from adscrawler_spark.functions.country import guess_country

        body = _json.loads(synth.synth_body(h, kind, row["url"]))
        return guess_country(body.get("developerAddress")) or row.get("country")
    return row.get("country")


def _listing_sort_key(row: dict, now: datetime):
    lca = row.get("last_crawled_at")
    days = NEVER_CRAWLED_DAYS if lca is None else (now.date() - lca.date()).days
    decay = max(row.get("installs") or 0, row.get("rating_count") or 0) * 100 * days
    return (
        -(1 if row.get("crawl_result") is None else 0),
        -(1 if row.get("ranked") else 0),
        -decay,
        row["url_hash"],
        row["row_hash64"],
    )


def _adstxt_sort_key(row: dict):
    lca = row.get("last_crawled_at")
    return (
        -(1 if row.get("ad_supported") else 0),
        (0, datetime.min) if lca is None else (1, lca),
        row["url_hash"],
        row["row_hash64"],
    )


def _claim(rows: list[dict], kinds: set[str], n: int, now: datetime) -> list[dict]:
    elig = [
        r
        for r in rows
        if r["doc_kind"] in kinds
        and (
            r["state"] == "pending"
            or (r["state"] == "leased" and r.get("leased_until", now) < now)
        )
    ]
    key = (
        (lambda r: _adstxt_sort_key(r))
        if kinds <= {"adstxt", "rankings"}  # both order by recrawl recency
        else (lambda r: _listing_sort_key(r, now))
    )
    top = sorted(elig, key=key)[:n]
    out, seen_canon = [], set()
    for rank, r in enumerate(top, start=1):
        if r["url_canon"] in seen_canon:
            continue
        seen_canon.add(r["url_canon"])
        out.append({**r, "claim_rank": rank})
    return out


def run_sim(
    frontier_rows: list[dict], cfg: SimConfig, generations: int
) -> SimState:
    rows = [dict(r) for r in frontier_rows]
    seen = {r["url_canon"] for r in rows}
    st = SimState(rows, seen, [], set(), {})

    for g in range(generations):
        now = EPOCH + timedelta(hours=g)
        claims = [
            ("listing", _claim(st.frontier, {"listing_play", "listing_ios"},
                               cfg.listing_batch, now)),
            ("adstxt", _claim(st.frontier, {"adstxt"}, cfg.adstxt_batch, now)),
            ("rankings", _claim(st.frontier, {"rankings"},
                                cfg.rankings_batch, now)),
        ]
        results: dict[str, tuple[int | None, bool, bool]] = {}
        discovered_domains: list[str] = []

        for family, claimed in claims:
            lane_counts: dict[tuple[str, int], int] = {}
            for r in claimed:
                st.claim_log.append((g, family, r["claim_rank"], r["url_canon"]))
                host = r["host"]
                disallow, delay = cfg.robots.get(
                    host, ([], cfg.default_crawl_delay)
                )
                if any(_path_of(r["url"]).startswith(p) for p in disallow):
                    results[r["url_canon"]] = (None, False, True)
                    continue
                lane = (
                    r["url_hash64"] % cfg.hot_lanes if host in HOT_HOSTS else 0
                )
                rank_in_lane = lane_counts.get((host, lane), 0)
                lane_counts[(host, lane)] = rank_in_lane + 1
                if rank_in_lane * delay >= cfg.budget_seconds:
                    results[r["url_canon"]] = (None, False, False)  # deferred
                    continue
                h = r["url_hash64"]
                result, _attempts, ok = synth.outcome_for(h, r["doc_kind"])
                if r["doc_kind"] == "adstxt" and ok:
                    entries, result = py_adstxt.parse_body(synth.synth_adstxt_body(h))
                    discovered_domains.extend(e[0] for e in entries)
                if r["doc_kind"] == "rankings" and ok and result == 1:
                    import json as _json

                    path = _path_of(r["url"])
                    seg = path.split("/rankings/", 1)[-1].split("/")
                    collection, category = seg[0], seg[1]
                    store = 1 if r["host"] == HOT_PLAY else 2
                    key = (store, now.date().isoformat(), r.get("country"),
                           collection, category)
                    # existence-probe skip: one ranked list per key per day
                    if key not in st.ranking_keys:
                        st.ranking_keys.add(key)
                        ranks = _json.loads(
                            synth.synth_rankings_body(h, r["url"])
                        )["ranks"]
                        for i, sid in enumerate(ranks, start=1):
                            st.rankings.add(key + (i, sid))
                if (ok or result in (2,)) and r["doc_kind"] != "rankings":
                    prefix = {
                        "listing_play": "gp::",
                        "listing_ios": "ios::",
                        "adstxt": "adstxt::",
                    }[r["doc_kind"]]
                    if ok and (r["doc_kind"] == "adstxt" or result == 1):
                        doc_id = prefix + r["url_canon"]
                        st.docs.add(doc_id)
                        st.doc_countries[doc_id] = _doc_country(r, h)
                results[r["url_canon"]] = (result, True, False)
                st.crawl_results[r["url_canon"]] = result

        # fold results into every frontier row sharing the canon
        for r in st.frontier:
            if r["url_canon"] not in results:
                continue
            res, fetched, denied = results[r["url_canon"]]
            if denied:
                r["state"] = "denied"
            elif not fetched:
                r["state"] = "pending"
            elif r["doc_kind"] == "rankings":
                # ranked lists re-enter pending (daily re-crawl cadence)
                r["state"] = "pending"
                r["crawl_result"] = res
                r["last_crawled_at"] = now
            else:
                r["state"] = "done" if res == 1 else "failed"
                r["crawl_result"] = res
                r["last_crawled_at"] = now
            r["leased_until"] = None

        # discovery
        new_hosts = []
        for dom in dict.fromkeys(discovered_domains):  # order-stable unique
            canon = dom + "/app-ads.txt"  # canonical URL = host + path
            if canon in st.seen:
                continue
            st.seen.add(canon)
            new_hosts.append(dom)
        for dom in new_hosts:
            canon = dom + "/app-ads.txt"
            uh, uh64, rh64 = cfg.hash_lookup.get(canon, (None, None, None))
            st.frontier.append(
                {
                    "url": f"https://{dom}/app-ads.txt",
                    "url_canon": canon,
                    "url_hash": uh,
                    "url_hash64": uh64,
                    "row_hash64": rh64,
                    "host": dom,
                    "doc_kind": "adstxt",
                    "crawl_result": None,
                    "ranked": False,
                    "ad_supported": False,
                    "installs": 0,
                    "rating_count": 0,
                    "last_crawled_at": None,
                    "state": "pending",
                    "leased_until": None,
                    "seed_id": "discovered",
                }
            )
    return st
