"""FetchBackend — the seam between the scheduler and the page source (N7).

The reference routes every request through a middleware chain that can
rewrite the transport: proxy pool rotation
(/root/reference/utils/proxy_pool.py:42-132), UA/cookie middleware and
retry-aware downloading (/root/reference/Douban2/middlewares.py:161-279).
This engine's batch equivalent is a two-method interface that maps the
round's popped URL slice to (url, html) rows; everything downstream
(extraction, link discovery, marks) is backend-agnostic.

Default backend: the corpus join — "fetch" = lookup into the
Common-Crawl-style pages table, per BASELINE.json input_hint. A real
deployment slots an HTTP backend here without touching the scheduler:
politeness is already enforced UPSTREAM by admission control (the slice
handed to fetch() is exactly the set of URLs the budgets allow this
round), so the backend only does transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FetchBackend:
    """Maps a DataFrame of (url) to (url, html). Missing rows = fetch
    failures; the engine requeues them with retry/backoff (P4/N9).

    CONTRACT: at most ONE row per url. The engine's round accounting
    (fetched/items counts, fetch_log lineage, the runner's arithmetic
    queued tracking) assumes url-uniqueness; run_round defensively
    dropDuplicates(["url"]) on the returned frame, keeping an arbitrary
    row per url — a backend that can fetch a url twice (HTTP retries,
    mirrored hosts) should pick its own winner to stay deterministic."""

    def fetch(self, urls: DataFrame) -> DataFrame:
        raise NotImplementedError

    def describe(self) -> str:
        return type(self).__name__


class CorpusFetchBackend(FetchBackend):
    """Fetch = inner equi-join against a pages corpus (F1).

    ``broadcast_slice`` gates the join strategy: a broadcast HINT is
    honored by Spark unconditionally (AQE never demotes it), so the
    caller — who knows the round's actual popped count — decides.
    run_round passes True only when the slice is at or under
    CrawlConfig.broadcast_slice_max_rows; a 10^7-row round at the
    10^10-URL design point takes the plain equi-join (sort-merge; with
    pages bucketed by url, bucket-local) instead of OOMing the driver.
    Misses (dead links) simply produce no row — the engine derives them
    against the hit set, never by anti-joining the full corpus.
    """

    def __init__(self, pages: DataFrame, broadcast_slice: bool = True):
        self.pages = pages
        self.broadcast_slice = broadcast_slice

    def fetch(self, urls: DataFrame) -> DataFrame:
        slice_df = F.broadcast(urls) if self.broadcast_slice else urls
        return self.pages.select("url", "html").join(slice_df, "url", "inner")


def write_bucketed_pages(
    pages: DataFrame,
    table_name: str,
    buckets: int = 64,
    path: str | None = None,
) -> None:
    """Materialize the pages corpus as a url-BUCKETED table — the at-scale
    fetch-join layout (SURVEY F1; BASELINE.json north_star "pages bucketed
    by url").

    When a round's popped slice exceeds the broadcast gate, the fetch is a
    plain equi-join on url; against an unbucketed corpus that sort-merge
    join SHUFFLES THE WHOLE CORPUS — at the 10^10-URL design point the
    dominant cost of every round (measured on separate-JVM executors:
    corpus-side shuffle traffic crossing process boundaries, not the
    extract kernel, capped e2e scaling). Against a bucketed table Spark
    reads each bucket in place (zero Exchange on the corpus side) and
    shuffles ONLY the slice into the same bucketing — per round that is
    O(slice), never O(corpus). Plan-shape asserted in
    tests/test_fetch_and_monitor.py.

    ``buckets`` should be sized so one bucket ~ a few GB at the target
    corpus (10^10 pages x ~50 KB -> tens of thousands of buckets).
    """
    w = pages.write.mode("overwrite").format("parquet").bucketBy(buckets, "url")
    if path is not None:
        w = w.option("path", path)
    w.sortBy("url").saveAsTable(table_name)


class HttpFetchBackend(FetchBackend):
    """Shape of a real HTTP backend (documentation stub — this sandbox has
    no network). A production implementation would ``mapInPandas`` over
    url batches, issuing pooled HTTP GETs per Arrow batch and yielding
    (url, html); failures yield no row so the engine's retry path engages.
    Proxy rotation / UA policy (the reference's middleware plane) live
    entirely inside this class."""

    def __init__(self, timeout_s: float = 30.0):
        self.timeout_s = timeout_s

    def fetch(self, urls: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "HTTP fetching is not available in this sandbox; use "
            "CorpusFetchBackend or implement fetch() with a mapInPandas "
            "HTTP pool as described in the class docstring"
        )
