"""Incremental (CDC-style) snapshot reads + frontier rescoring.

* ``SnapshotStore.added_since``: a consumer that checkpoints a snapshot
  id sees every appended row exactly once, reading O(delta) files;
  rewrite commits (compaction/rescore) are skipped; expired history
  raises instead of silently re-feeding.
* ``FrontierStore.corpus_added_since``: the emit_text corpus as a
  continuous feed into incremental dedup.
* ``crawl.rescore_frontier``: OPIC/PageRank-style queue re-ranking —
  queued rows pop in the new priority order, non-queued rows and the
  queued count are untouched, resume stays exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.crawl import rescore_frontier
from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
from crawlspark.schema import PAGES, ROBOTS, SEEDS
from crawlspark.store import SnapshotStore
from crawlspark.synth import SiteSpec, generate_site

CFG = CrawlConfig(round_wall=25.0, max_depth=1, emit_text=True)  # r5: fewer rounds, same contracts


def _dfs(spark, site):
    return (
        spark.createDataFrame(site["pages"], schema=PAGES),
        spark.createDataFrame(site["seeds"], schema=SEEDS),
        spark.createDataFrame(site["robots"], schema=ROBOTS),
    )


def _site():
    return generate_site(SiteSpec(n_hosts=2, lists_per_host=2, per_list=4, seed=11))


def _batch(spark, ids):
    return spark.createDataFrame([(i, f"v{i}") for i in ids], ["id", "val"])


def test_added_since_exactly_once(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "t"), ["id", "val"])
    assert st.added_since(None) is None  # empty table
    st.append(_batch(spark, [0, 1]), round_no=0)
    ck1 = st._current_id()
    st.append(_batch(spark, [2]), round_no=1)
    st.append(_batch(spark, [3, 4]), round_no=2)

    # from the beginning = the full table
    assert sorted(r["id"] for r in st.added_since(None).collect()) == [0, 1, 2, 3, 4]
    # from the checkpoint: only later appends, each exactly once
    assert sorted(r["id"] for r in st.added_since(ck1).collect()) == [2, 3, 4]
    # nothing new after the head
    head = st._current_id()
    assert st.added_since(head) is None


def test_added_since_skips_rewrites(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "t"), ["id", "val"])
    st.append(_batch(spark, [0, 1]), round_no=0)
    ck = st._current_id()
    st.append(_batch(spark, [2]), round_no=1)
    # compaction: content-preserving rewrite of the whole table
    st.overwrite(st.read(), round_no=1, meta={"compaction": True})
    st.append(_batch(spark, [3]), round_no=2)
    # the rewrite's files (which re-contain 0,1,2) must NOT re-feed
    assert sorted(r["id"] for r in st.added_since(ck).collect()) == [2, 3]


def test_added_since_expired_history_raises(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "t"), ["id", "val"])
    st.append(_batch(spark, [0]), round_no=0)
    ck = st._current_id()
    st.append(_batch(spark, [1]), round_no=1)
    st.append(_batch(spark, [2]), round_no=5)
    st.expire_snapshots(keep_from_round=5)
    with pytest.raises(ValueError, match="expired"):
        st.added_since(ck)


def test_corpus_added_since_feeds_incremental_dedup(spark, tmp_path):
    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    runner.run(pages, robots, stop_after_round=0)
    ck = runner.store.corpus._current_id()
    round0 = {r["url"] for r in runner.store.corpus_state().collect()}

    resumed = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    resumed.run(pages, robots)
    delta = resumed.store.corpus_added_since(ck)
    delta_urls = {r["url"] for r in delta.collect()}
    all_urls = {r["url"] for r in resumed.store.corpus_state().collect()}
    # the delta is exactly the post-checkpoint crawl product
    assert delta_urls == all_urls - round0 and delta_urls
    assert all(r["crawl_round"] >= 1 for r in delta.collect())


def test_rescore_frontier_changes_pop_order(spark, tmp_path):
    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    runner.run(pages, robots, stop_after_round=0)

    store = runner.store
    real_pages = {p["url"] for p in site["pages"]}
    queued = [
        r
        for r in store.frontier_state()
        .filter(F.col("status") == "queued")
        .orderBy("host", F.desc("priority"), "seq")
        .collect()
        # robots-denied rows never pop; dead links pop but never reach
        # the fetch log — boost only fetchable pages
        if r["url"] in real_pages and "/private/" not in r["url"]
    ]
    assert len(queued) >= 2
    # boost the LAST-in-line queued url of each host to the front
    last_per_host: dict = {}
    for r in queued:
        last_per_host[r["host"]] = r["url"]
    scores = spark.createDataFrame(
        [(u, 99) for u in last_per_host.values()], ["url", "priority"]
    )
    hint_before = store.queued_after_hint()
    out = rescore_frontier(store, scores)
    assert out["rescored"] == len(last_per_host)
    assert store.queued_after_hint() == hint_before  # count untouched

    resumed = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    resumed.run(pages, robots)
    log = resumed.store.fetch_log_state().filter(F.col("round") == 1).collect()
    first_popped = {r["host"]: r["url"] for r in log if r["rn"] == 1}
    for host, url in last_per_host.items():
        assert first_popped[host] == url  # boosted row pops first
    # completeness: the rescore lost nothing — every admissible page
    # still fetched (robots deny /private/ by design)
    fetched = {u for (_, _, u) in resumed.fetch_sequence()}
    assert fetched == {u for u in real_pages if "/private/" not in u}


def test_rescore_noop_on_done_rows(spark, tmp_path):
    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    runner.run(pages, robots)  # crawl to completion: nothing queued

    store = runner.store
    before = sorted(
        map(tuple, store.frontier_state().select("fp", "priority", "status").collect())
    )
    done_url = store.frontier_state().limit(1).collect()[0]["url"]
    out = rescore_frontier(
        store, spark.createDataFrame([(done_url, 77)], ["url", "priority"])
    )
    assert out["rescored"] == 0
    after = sorted(
        map(tuple, store.frontier_state().select("fp", "priority", "status").collect())
    )
    assert before == after


def test_requeue_urls_recrawls_exactly_the_flipped_rows(spark, tmp_path):
    from crawlspark.crawl import requeue_urls

    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    runner.run(pages, robots)  # crawl to completion: nothing queued

    store = runner.store
    log0 = store.fetch_log_state()
    max_round = log0.agg(F.max("round")).collect()[0][0]
    fetched_once = {r["url"] for r in log0.select("url").collect()}
    pick = sorted(fetched_once)[:2]

    hint_before = store.queued_after_hint()
    assert hint_before == 0  # drained
    out = requeue_urls(
        store, spark.createDataFrame([(u, 99) for u in pick], ["url", "priority"])
    )
    assert out["requeued"] == 2
    assert store.queued_after_hint() == 2
    st = {
        r["url"]: (r["status"], r["priority"])
        for r in store.frontier_state().collect()
    }
    for u in pick:
        assert st[u] == ("queued", 99)

    # a resumed runner picks up the "finished" crawl and re-fetches
    # exactly the requeued urls, then drains again
    resumed = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    res = resumed.run(pages, robots)
    assert res.total_fetched == 2
    relog = resumed.store.fetch_log_state().filter(F.col("round") > max_round)
    assert sorted(r["url"] for r in relog.collect()) == pick
    assert resumed.store.queued_after_hint() == 0
    # the requeued rows are DONE again; nothing is left in line
    # (exhausted/robots_denied rows keep their terminal statuses)
    final = {
        r["url"]: r["status"]
        for r in resumed.store.frontier_state().collect()
    }
    assert all(final[u] == "done" for u in pick)
    assert "queued" not in set(final.values())


def test_requeue_ignores_unknown_and_queued_rows(spark, tmp_path):
    from crawlspark.crawl import requeue_urls

    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    runner.run(pages, robots, stop_after_round=0)  # round 0 only: rows queued

    store = runner.store
    queued_url = (
        store.frontier_state().filter(F.col("status") == "queued").limit(1)
    ).collect()[0]["url"]
    before = sorted(
        map(tuple, store.frontier_state().select("fp", "status", "priority").collect())
    )
    hint = store.queued_after_hint()
    out = requeue_urls(
        store,
        spark.createDataFrame(
            [(queued_url,), ("https://nowhere.example/x",)], ["url"]
        ),
    )
    assert out["requeued"] == 0
    assert store.queued_after_hint() == hint
    after = sorted(
        map(tuple, store.frontier_state().select("fp", "status", "priority").collect())
    )
    assert before == after


def test_revisit_schedule_feeds_requeue(spark, tmp_path):
    """The production revisit loop: fetch history -> revisit_schedule ->
    due urls -> requeue_urls -> the next run re-crawls them."""
    from crawlspark.crawl import requeue_urls
    from crawlspark.scheduler import revisit_schedule

    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    runner.run(pages, robots)

    store = runner.store
    # history from the engine's own corpus (emit_text): content hash per fetch
    hist = store.corpus_state().select(
        "url",
        F.col("crawl_round").alias("round"),
        F.md5("text").alias("fingerprint"),
    )
    sched_out = revisit_schedule(hist, base_interval=1, max_interval=8)
    cur = store.last_committed_round()
    due = sched_out.filter(F.col("next_round") <= cur + 1).select("url")
    n_due = due.count()
    assert n_due > 0  # single-fetch urls are due after base_interval
    out = requeue_urls(store, due)
    assert out["requeued"] == n_due

    resumed = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    res = resumed.run(pages, robots)
    assert res.total_fetched == n_due
    assert resumed.store.queued_after_hint() == 0
