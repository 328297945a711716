"""The full crawl-to-training-data composition, end to end in one test:

    synthetic site -> CrawlRunner(emit_text) -> corpus table
      -> corpus_prep (lang/quality filter + exact + near dedup)
      -> shard_plan (deterministic byte-budget shard assignment)
      -> write_wet (byte-deterministic WET shards) -> read_wet

Every stage is individually gated/oracled elsewhere; this pins that they
COMPOSE — the corpus a crawl emits is directly consumable by the
training-data plane, and the published WET shards round-trip
byte-identically and deterministically (re-publishing the identical
relation yields the identical bytes, the replay/resume contract).
"""

from __future__ import annotations

import gzip
import hashlib

import pyspark.sql.functions as F

from crawlspark.pipeline import corpus_prep
from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
from crawlspark.schema import PAGES, ROBOTS, SEEDS
from crawlspark.synth import SiteSpec, generate_site
from crawlspark.textops import shard_plan
from crawlspark.warc import read_wet, write_wet


def _shard_bytes(out_dir) -> dict[str, str]:
    import os

    got = {}
    for root, _dirs, files in os.walk(out_dir):
        for f in sorted(files):
            if f.endswith(".warc.wet.gz"):
                with open(os.path.join(root, f), "rb") as fh:
                    got[f] = hashlib.md5(fh.read()).hexdigest()
    return got


def test_crawl_to_training_shards(spark, tmp_path):
    site = generate_site(
        SiteSpec(n_hosts=2, lists_per_host=3, per_list=5, seed=11)
    )
    pages = spark.createDataFrame(site["pages"], schema=PAGES)
    seeds = spark.createDataFrame(site["seeds"], schema=SEEDS)
    robots = spark.createDataFrame(site["robots"], schema=ROBOTS)

    runner = CrawlRunner(
        spark,
        str(tmp_path / "state"),
        CrawlConfig(round_wall=25.0, max_depth=1, emit_text=True),
    )
    runner.init(seeds)
    res = runner.run(pages, robots)
    assert res.total_fetched > 0

    corpus = runner.store.corpus_state()
    n_corpus = corpus.count()
    assert n_corpus == res.total_fetched

    # corpus rows -> the documents shape the training-data plane takes:
    # deterministic numeric doc_id from the url fingerprint coin
    docs = corpus.select(
        F.conv(F.substring(F.md5("url"), 1, 8), 16, 10)
        .cast("long")
        .alias("doc_id"),
        "url",
        "text",
    )
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0

    survivors = corpus_prep(
        docs, lang="en", min_quality=0.0, jaccard_threshold=0.5
    )
    kept = docs.join(survivors, "doc_id")
    n_kept = kept.count()
    assert 0 < n_kept <= n_corpus

    # deterministic byte-budget shard assignment over the survivors
    plan = shard_plan(kept, target_bytes=4096, bucket_width=10**15)
    planned = kept.join(plan.select("doc_id", "shard"), "doc_id")
    assert planned.count() == n_kept
    n_shards = planned.select("shard").distinct().count()
    assert n_shards >= 1

    # publish as WET, one file per shard partition
    # sortWithinPartitions pins the intra-partition row order (a join
    # upstream makes arrival order run-dependent); shard bytes are then
    # a pure function of (partitioning, sort key) — the store.py rule
    wet_in = (
        planned.select(
            "url",
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            "text",
        )
        .repartition(max(n_shards, 1), "url")
        .sortWithinPartitions("url")
    )
    out1 = str(tmp_path / "wet1")
    manifest = write_wet(wet_in, out1).collect()
    assert sum(m["n_records"] for m in manifest) == n_kept

    # round-trip: published text is byte-identical to the corpus text
    back = read_wet(spark, out1)
    want = {(r["url"], r["text"]) for r in kept.select("url", "text").collect()}
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == want

    # determinism: re-publishing the identical relation yields identical
    # shard BYTES (the replay/resume contract, file by file)
    out2 = str(tmp_path / "wet2")
    write_wet(wet_in, out2).collect()
    assert _shard_bytes(out1) == _shard_bytes(out2)
