#!/usr/bin/env python
"""Data-plane kernel scaling control: the extract kernel (K4 — the crawl
round's real per-URL compute: html parse, field extraction, link
discovery, byte-identical text) over Common-Crawl-sized pages, in
isolation, at multiple local[N] levels.

Why this control exists: the end-to-end crawl bench at sandbox scale is
FIXED-COST bound (driver round-trips, stage scheduling, snapshot commits
— ~30 s per run regardless of cores), so its wall time cannot expose
compute scaling at any level pair. At 10^10-URL scale a round processes
millions of pages per executor and the kernel IS the round; this bench
measures that term directly. Each level runs the identical job on the
identical parquet input.

Usage: python bench/kernel_scaling.py [n_pages] [pad_words] [levels]
"""

from __future__ import annotations

import json
import os

import subprocess
import sys



REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, corpus: str) -> float:
    """Child process per level: fresh JVM, identical job."""
    code = f"""
import sys, time
sys.path.insert(0, {REPO!r})
from crawlspark.session import get_spark
from crawlspark.kernels import extract_records_and_links
import pyspark.sql.functions as F
spark = get_spark("kernel-scale", master="local[{cpus}]", shuffle_partitions={cpus})
df = spark.read.parquet({corpus!r})
t0 = time.perf_counter()
n = extract_records_and_links(df).select(F.length("text").alias("l"), F.size("links").alias("k")).agg(F.sum("l"), F.sum("k")).collect()
print("KERNEL_SECONDS", round(time.perf_counter() - t0, 2))
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("KERNEL_SECONDS"):
            return float(line.split()[1])
    raise RuntimeError(out.stdout + out.stderr)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    pad = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    levels = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "2,8,32").split(",")]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    from crawlspark.schema import PAGES
    from crawlspark.session import get_spark
    from crawlspark.synth import SiteSpec, generate_site, inflate_pages

    # persistent corpus, reused across invocations (identical input is the
    # point of the protocol; regeneration is deterministic anyway).
    # 64 files: the input layout must never cap a level's parallelism —
    # an 8-file corpus silently limits the extract stage to 8 tasks at
    # EVERY level (each file is one parquet row group, the minimum read
    # unit), which masquerades as "doesn't scale".
    corpus = f"/tmp/kernscale_corpus_{n_pages}_{pad}_v2"
    if not os.path.exists(corpus + "/_SUCCESS"):
        spark = get_spark("kernel-corpus", master="local[8]", shuffle_partitions=8)
        n_hosts = max(8, n_pages // 800)
        site = generate_site(SiteSpec(
            n_hosts=n_hosts,
            lists_per_host=max(1, n_pages // (n_hosts * 26)),
            per_list=25, dead_links_per_host=0, seed=42,
        ))
        base = spark.createDataFrame(site["pages"], schema=PAGES)
        inflate_pages(base, pad).repartition(64).write.mode("overwrite").parquet(corpus)
        spark.stop()

    # interleave reps across levels (VM noise is time-correlated) and
    # ACCUMULATE across invocations, saving after EVERY child run — this
    # VM has multi-minute windows of 5x degradation, so best-of-many is
    # the only stable statistic and partial progress must survive.
    out_path = os.path.join(REPO, "BENCH", "kernel_scaling.json")
    times: dict[int, list[float]] = {lv: [] for lv in levels}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        if prev.get("pad_words") == pad:
            for k, v in prev.get("all_runs", {}).items():
                times.setdefault(int(k), []).extend(v)

    def save() -> dict:
        best = {lv: min(ts) for lv, ts in times.items() if ts}
        out = {"n_pages": n_pages, "pad_words": pad,
               "kernel_seconds_best": best, "all_runs": times}
        for lo, hi in ((1, 4), (2, 8), (8, 32)):
            if lo in best and hi in best:
                out[f"speedup_{lo}to{hi}"] = round(best[lo] / best[hi], 2)
                out[f"efficiency_{lo}to{hi}"] = round(best[lo] / best[hi] / 4, 3)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        return out

    for _ in range(reps):
        for lv in levels:
            t = run_level(lv, corpus)
            times.setdefault(lv, []).append(t)
            print(json.dumps({"level": lv, "seconds": t}), flush=True)
            save()
    print(json.dumps(save()))


if __name__ == "__main__":
    main()
