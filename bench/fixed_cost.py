#!/usr/bin/env python
"""Per-term fixed-cost breakdown of a crawl round (judge r2 #2): run the
bench crawl at a given local[N] with CRAWLSPARK_TIMING=1, parse the
engine's own phase marks, and report which terms scale with cores and
which are round-constants (driver latency, commits) that amortize at the
10^10-URL design point. Accumulates best-of per (level, phase) into
BENCH/fixed_cost.json across invocations (same noise protocol as the
other benches).

Usage: python bench/fixed_cost.py [pages] [pad] [levels] [reps]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, "BENCH")
PHASE_RE = re.compile(r"\[round (-?\d+)\] (.+?): ([0-9.]+)s")


def run_level(cpus: int, pages: int, pad: int) -> dict:
    code = f"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, {REPO!r})
os.environ["CRAWLSPARK_TIMING"] = "1"
from crawlspark.session import get_spark
from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
from crawlspark.schema import PAGES, ROBOTS, SEEDS
from crawlspark.synth import SiteSpec, generate_site, inflate_pages

spark = get_spark("fixedcost", master="local[{cpus}]", shuffle_partitions={cpus})
n_hosts = max(8, {pages} // 800)
site = generate_site(SiteSpec(n_hosts=n_hosts,
    lists_per_host=max(1, {pages} // (n_hosts * 26)), per_list=25,
    dead_links_per_host=0, private_hosts=1, slow_hosts=1, seed=42))
root = tempfile.mkdtemp(prefix="fixedcost_")
base = spark.createDataFrame(site["pages"], schema=PAGES)
inflate_pages(base, {pad}).repartition(64).write.mode("overwrite").parquet(root + "/pages")
pages_df = spark.read.parquet(root + "/pages")
seeds = spark.createDataFrame(site["seeds"], schema=SEEDS)
robots = spark.createDataFrame(site["robots"], schema=ROBOTS)
cfg = CrawlConfig(round_wall=1e9, per_host_cap=10**6, max_depth=1)
runner = CrawlRunner(spark, root + "/store", cfg)
t0 = time.perf_counter()
runner.init(seeds)
t_seed = time.perf_counter() - t0
print(f"  [round -1] seed: {{t_seed:.2f}}s", flush=True)
t1 = time.perf_counter()
res = runner.run(pages_df, robots)
print(f"TOTAL_WALL {{time.perf_counter() - t0:.2f}} FETCHED {{res.total_fetched}}", flush=True)
shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    phases: dict[str, float] = {}
    for m in PHASE_RE.finditer(out.stdout):
        key = f"r{m.group(1)}:{m.group(2)}"
        phases[key] = phases.get(key, 0.0) + float(m.group(3))
    mt = re.search(r"TOTAL_WALL ([0-9.]+) FETCHED (\d+)", out.stdout)
    if not mt:
        raise RuntimeError(out.stdout[-3000:] + out.stderr[-3000:])
    phases["total_wall"] = float(mt.group(1))
    phases["urls_fetched"] = int(mt.group(2))
    return phases


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    pad = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    levels = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "1,4").split(",")]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    out_path = os.path.join(BENCH_DIR, "fixed_cost.json")
    data: dict = {"pages": pages, "pad_words": pad, "runs": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        if prev.get("pages") == pages and prev.get("pad_words") == pad:
            data = prev

    for _ in range(reps):
        for lv in levels:
            ph = run_level(lv, pages, pad)
            data["runs"].setdefault(str(lv), []).append(ph)
            with open(out_path, "w") as f:
                json.dump(data, f, indent=1)
            print(json.dumps({"level": lv, **ph}), flush=True)

    # best-of summary per phase per level
    summary: dict[str, dict[str, float]] = {}
    for lv, runs in data["runs"].items():
        keys = {k for r in runs for k in r if k != "urls_fetched"}
        summary[lv] = {k: min(r[k] for r in runs if k in r) for k in keys}
    data["best"] = summary
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
