"""emit_text corpus-building mode (north_star: "extracts byte-identical
text per url from html"): each round persists (url, text, crawl_round) to
the `corpus` output table with the round's atomic commit — the engine as
a Common-Crawl-style corpus producer.

Contracts pinned here:
* byte-identity: every persisted text equals the pure-python
  extract_page(url, html)["text"] for that url's html (the same oracle
  the kernel byte-identity tests use);
* completeness: one corpus row per fetched url, across all rounds;
* kill-resume: a run killed after round 0 and resumed converges to the
  identical corpus table (rollback_to_round covers the new table);
* default-off: no corpus rows are written unless cfg.emit_text is set.
"""

from __future__ import annotations

from crawlspark.kernels import extract_page
from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
from crawlspark.schema import PAGES, ROBOTS, SEEDS
from crawlspark.synth import SiteSpec, generate_site

CFG = CrawlConfig(round_wall=25.0, max_depth=1, emit_text=True)  # r5: fewer rounds, same contracts


def _dfs(spark, site):
    return (
        spark.createDataFrame(site["pages"], schema=PAGES),
        spark.createDataFrame(site["seeds"], schema=SEEDS),
        spark.createDataFrame(site["robots"], schema=ROBOTS),
    )


def _site():
    return generate_site(SiteSpec(n_hosts=2, lists_per_host=3, per_list=5, seed=7))


def _corpus_rows(runner):
    df = runner.store.corpus_state()
    return {} if df is None else {
        r["url"]: (r["text"], r["crawl_round"]) for r in df.collect()
    }


def test_corpus_byte_identity_and_completeness(spark, tmp_path):
    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    res = runner.run(pages, robots)

    corpus = _corpus_rows(runner)
    # one row per fetched url, across all rounds
    assert len(corpus) == res.total_fetched > 0
    fetched_urls = {u for (_, _, u) in runner.fetch_sequence()}
    assert set(corpus) == fetched_urls

    # byte-identity vs the pure-python kernel oracle on the source html
    html_by_url = {p["url"]: p["html"] for p in site["pages"]}
    for url, (text, _) in corpus.items():
        assert text == extract_page(url, html_by_url[url])["text"], url


def test_corpus_kill_resume_identical(spark, tmp_path):
    site = _site()
    pages, seeds, robots = _dfs(spark, site)

    ref = CrawlRunner(spark, str(tmp_path / "ref"), CFG)
    ref.init(seeds)
    ref.run(pages, robots)

    killed = CrawlRunner(spark, str(tmp_path / "kill"), CFG)
    killed.init(seeds)
    killed.run(pages, robots, stop_after_round=0)
    resumed = CrawlRunner(spark, str(tmp_path / "kill"), CFG)  # fresh handle
    resumed.run(pages, robots)

    assert _corpus_rows(resumed) == _corpus_rows(ref)


def test_corpus_rollback_on_resume(spark, tmp_path):
    """A corpus commit left ahead of the frontier (crash between sibling
    commits) is rolled back by resume_round."""
    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    runner.init(seeds)
    runner.run(pages, robots, stop_after_round=0)

    before = _corpus_rows(runner)
    # simulate: corpus got an extra commit for round 99 that the frontier
    # never ratified
    extra = spark.createDataFrame(
        [("http://phantom.example/x", "phantom text", 99)],
        schema="url string, text string, crawl_round int",
    )
    runner.store.corpus.append(extra, 99)
    fresh = CrawlRunner(spark, str(tmp_path / "s"), CFG)
    fresh.resume_round()
    assert _corpus_rows(fresh) == before


def test_default_off_writes_no_corpus(spark, tmp_path):
    site = _site()
    pages, seeds, robots = _dfs(spark, site)
    runner = CrawlRunner(spark, str(tmp_path / "s"),
                         CrawlConfig(round_wall=25.0, max_depth=1))
    runner.init(seeds)
    runner.run(pages, robots)
    assert runner.store.corpus_state() is None
