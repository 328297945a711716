"""FetchBackend seam (N7) + monitor rendering (reference utils/monitor.py
analog): the engine must run unchanged through an explicitly-supplied
backend, refuse politely on the HTTP stub, and render per-round progress
from the metrics table."""

from __future__ import annotations

import pytest

from crawlspark.fetch import CorpusFetchBackend, FetchBackend, HttpFetchBackend
from crawlspark.monitor import progress_frame, render_progress
from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
from crawlspark.schema import PAGES, ROBOTS, SEEDS
from crawlspark.synth import SiteSpec, generate_site


@pytest.fixture(scope="module")
def site(spark):
    data = generate_site(SiteSpec(n_hosts=2, lists_per_host=1, per_list=5, seed=7))
    return {
        "pages": spark.createDataFrame(data["pages"], schema=PAGES),
        "seeds": spark.createDataFrame(data["seeds"], schema=SEEDS),
        "robots": spark.createDataFrame(data["robots"], schema=ROBOTS),
    }


def test_bucketed_pages_join_avoids_corpus_shuffle(spark, site, tmp_path):
    """F1 at-scale layout: against a url-bucketed pages table, the
    non-broadcast fetch join must read the corpus bucket-in-place (no
    Exchange on the pages side — only the slice shuffles) and return the
    same rows as the unbucketed join."""
    from crawlspark.fetch import write_bucketed_pages

    write_bucketed_pages(site["pages"], "pages_bucketed_t", buckets=8,
                         path=str(tmp_path / "pages_bucketed"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # model the at-scale case: the slice is NOT broadcastable (a 10^7-row
    # round), so forbid auto-broadcast and look at the equi-join shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tbl = spark.table("pages_bucketed_t")
        urls = site["pages"].select("url").limit(7)
        joined = CorpusFetchBackend(tbl, broadcast_slice=False).fetch(urls)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # exactly one shuffle: the slice side; zero on the corpus side
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BroadcastHashJoin" not in plan
        got = {r["url"] for r in joined.collect()}
        want = {r["url"] for r in
                CorpusFetchBackend(site["pages"], broadcast_slice=False)
                .fetch(urls).collect()}
        assert got == want and len(got) == 7
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pages_bucketed_t")


def test_crawl_through_explicit_backend(spark, site, tmp_path):
    """Explicit CorpusFetchBackend == default fetch behavior, end to end."""
    cfg = CrawlConfig(round_wall=1e9, per_host_cap=1000, max_depth=1)
    runner = CrawlRunner(spark, str(tmp_path / "store"), cfg)
    runner.init(site["seeds"])
    res = runner.run(site["pages"], site["robots"],
                     backend=CorpusFetchBackend(site["pages"]))
    assert res.total_fetched > 0

    # monitor renders the finished run's metrics
    pf = progress_frame(runner.store)
    assert pf is not None and pf.count() == len(res.counts)
    text = render_progress(runner.store)
    assert "total" in text and "frontier now:" in text
    # totals line agrees with the runner's own counts
    total_fetched = sum(c.get("fetched", 0) for c in res.counts)
    assert f"{total_fetched:>9}" in text.splitlines()[-2]


def test_http_backend_is_an_honest_stub(spark, site):
    with pytest.raises(NotImplementedError):
        HttpFetchBackend().fetch(site["pages"].select("url"))
    assert HttpFetchBackend().describe() == "HttpFetchBackend"


def test_custom_backend_drives_misses(spark, site, tmp_path):
    """A backend that drops every page => all pops retry then exhaust —
    the retry path is exercised entirely through the seam."""

    class EmptyBackend(FetchBackend):
        def __init__(self, pages):
            self.pages = pages

        def fetch(self, urls):
            return self.pages.select("url", "html").limit(0)

    cfg = CrawlConfig(round_wall=1e9, per_host_cap=1000, max_depth=1, max_retries=2)
    runner = CrawlRunner(spark, str(tmp_path / "store2"), cfg)
    runner.init(site["seeds"])
    res = runner.run(site["pages"], site["robots"], backend=EmptyBackend(site["pages"]))
    assert res.total_fetched == 0
    assert sum(c.get("exhausted", 0) for c in res.counts) > 0


@pytest.mark.slow
def test_duplicate_emitting_backend_counts_stay_sane(spark, site, tmp_path):
    """ADVICE r2 (medium): a backend that returns the same url TWICE (easy
    with HTTP retries) must not inflate fetched/items or drive 'missed'
    negative — run_round enforces url-uniqueness on the backend output."""

    class DoubleBackend(FetchBackend):
        def __init__(self, pages):
            self.pages = pages

        def fetch(self, urls):
            hit = self.pages.select("url", "html").join(urls, "url", "inner")
            return hit.unionByName(hit)  # every url twice

    cfg = CrawlConfig(round_wall=1e9, per_host_cap=1000, max_depth=1)
    ref = CrawlRunner(spark, str(tmp_path / "ref"), cfg)
    ref.init(site["seeds"])
    ref_res = ref.run(site["pages"], site["robots"])

    dup = CrawlRunner(spark, str(tmp_path / "dup"), cfg)
    dup.init(site["seeds"])
    dup_res = dup.run(site["pages"], site["robots"],
                      backend=DoubleBackend(site["pages"]))

    assert dup_res.counts == ref_res.counts  # identical per-round counts
    for c in dup_res.counts:
        assert c.get("missed", 0) >= 0
    assert dup.fetch_sequence() == ref.fetch_sequence()


def test_corpus_backend_broadcast_gate_plan_shapes(spark, site):
    """VERDICT r2 #1: the slice join broadcasts ONLY when the caller says the
    slice is small; otherwise it must stay a shuffle join (a broadcast HINT
    is honored regardless of size — at the 10^10-URL design point that's a
    driver OOM)."""
    from crawlspark import plans

    urls = site["pages"].select("url").limit(3)
    bc = CorpusFetchBackend(site["pages"], broadcast_slice=True).fetch(urls)
    assert plans.uses_broadcast_join(bc), plans.explain_str(bc)

    # with the auto-broadcast threshold off, the gated-off path must NOT
    # contain any broadcast join — the hint is gone, not merely demoted
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nb = CorpusFetchBackend(site["pages"], broadcast_slice=False).fetch(urls)
        assert not plans.uses_broadcast_join(nb), plans.explain_str(nb)
        assert "SortMergeJoin" in plans.explain_str(nb, "simple")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


@pytest.mark.slow
def test_big_slice_path_crawls_identically(spark, site, tmp_path):
    """Forcing every round down the non-broadcast (sort-merge) path must
    produce byte-identical crawl results + order — the gate changes the
    physical plan only."""
    cfg = CrawlConfig(round_wall=1e9, per_host_cap=1000, max_depth=1)
    ref = CrawlRunner(spark, str(tmp_path / "ref2"), cfg)
    ref.init(site["seeds"])
    ref.run(site["pages"], site["robots"])

    cfg_nb = CrawlConfig(round_wall=1e9, per_host_cap=1000, max_depth=1,
                         broadcast_slice_max_rows=0)
    nb = CrawlRunner(spark, str(tmp_path / "nb"), cfg_nb)
    nb.init(site["seeds"])
    nb.run(site["pages"], site["robots"])

    assert nb.fetch_sequence() == ref.fetch_sequence()
    assert nb.seen_urls() == ref.seen_urls()
