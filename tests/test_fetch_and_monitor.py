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
