"""Kill-resume parity (north_rule): a run killed after round k and resumed
must converge to exactly the same frontier state, seen set, fetch order and
results as an uninterrupted run. Also covers the scrapy-redis
SCHEDULER_PERSIST=True semantics (reopen from snapshot,
/root/reference/Douban2/settings.py:72) — SURVEY §5.3/§5.5."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
from crawlspark.schema import PAGES, ROBOTS, SEEDS
from crawlspark.synth import SiteSpec, generate_site

CFG = CrawlConfig(round_wall=10.0, max_depth=1)


def _dfs(spark, site):
    return (
        spark.createDataFrame(site["pages"], schema=PAGES),
        spark.createDataFrame(site["seeds"], schema=SEEDS),
        spark.createDataFrame(site["robots"], schema=ROBOTS),
    )


def _final_state(runner: CrawlRunner):
    frontier = {
        (r["fp"], r["status"], r["retry_count"])
        for r in runner.store.frontier_state().collect()
    }
    return frontier, runner.seen_urls(), runner.fetch_sequence(), {
        r["rank"]: r["url"] for r in (runner.store.results_state() or []).collect()
    }


def test_kill_after_round_k_resume_identical(spark, tmp_path):
    site = generate_site(SiteSpec(n_hosts=2, lists_per_host=4, per_list=6, seed=11))
    pages, seeds, robots = _dfs(spark, site)

    # uninterrupted reference run
    ref = CrawlRunner(spark, str(tmp_path / "ref"), CFG)
    ref.init(seeds)
    ref.run(pages, robots)

    # killed-and-resumed run: stop after round 1, reopen a NEW runner
    killed = CrawlRunner(spark, str(tmp_path / "kill"), CFG)
    killed.init(seeds)
    killed.run(pages, robots, stop_after_round=1)

    resumed = CrawlRunner(spark, str(tmp_path / "kill"), CFG)  # fresh handle
    assert resumed.resume_round() == 2
    resumed.run(pages, robots)

    assert _final_state(resumed) == _final_state(ref)


def test_resume_rolls_back_sibling_tables(spark, tmp_path):
    """Simulate a crash mid-round: sibling tables committed ahead of the
    frontier get rolled back to the frontier's round on reopen."""
    from crawlspark.schema import METRICS

    site = generate_site(SiteSpec(n_hosts=1, lists_per_host=3, per_list=4, seed=5))
    pages, seeds, robots = _dfs(spark, site)
    r1 = CrawlRunner(spark, str(tmp_path / "c"), CFG)
    r1.init(seeds)
    r1.run(pages, robots, stop_after_round=0)
    # fake a mid-round-1 crash: metrics for round 1 committed, frontier not
    r1.store.append_metrics(
        spark.createDataFrame([(1, "popped", 99)], schema=METRICS), round_no=1
    )
    r2 = CrawlRunner(spark, str(tmp_path / "c"), CFG)
    assert r2.resume_round() == 1
    m = r2.store.metrics_state()
    assert m.filter(F.col("round") == 1).count() == 0  # rolled back
