#!/usr/bin/env python
"""Measure parquet bloom-filter file skipping on the seen-set fingerprint
column (SURVEY D1's promise; wired in store.py + crawl._write_tee).

Writes the same N-row seen-like table twice (with / without
``parquet.bloom.filter.enabled#fp``), then times point/IN-list membership
probes. Fingerprints are random hex, so min/max row-group stats prune
nothing — any win is the bloom filter's. Prints one JSON line and is
merged into BENCH/BASELINE.md by hand.

Usage: python bench/bloom.py [n_rows] [n_probes]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawlspark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("bloom-bench", master="local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="bloombench_")
    try:
        base = (
            spark.range(n_rows)
            .select(
                F.sha1(F.col("id").cast("string")).alias("fp"),
                F.concat(F.lit("http://h"), F.pmod(F.col("id"), F.lit(997)),
                         F.lit(".example/item/"), F.col("id")).alias("url"),
                F.pmod(F.col("id"), F.lit(64)).cast("int").alias("host_bucket"),
                F.lit(0).alias("first_round"),
            )
            .repartition(16)  # 16 files -> 16+ row groups to skip
        )
        base.write.mode("overwrite").option(
            "parquet.bloom.filter.enabled#fp", "true"
        ).parquet(f"{root}/with_bloom")
        base.write.mode("overwrite").parquet(f"{root}/no_bloom")

        # membership probes: fps that EXIST (worst case: bloom can't skip
        # the owning group) and fps that DON'T (best case: every group
        # skipped). The seen anti-join's per-round reality is mostly-absent.
        present = [r["fp"] for r in base.limit(n_probes).collect()]
        absent = [f"{i:040x}" for i in range(n_probes)]

        def probe(path: str, fps: list[str]) -> float:
            df = spark.read.parquet(path)
            t0 = time.perf_counter()
            df.filter(F.col("fp").isin(fps)).count()
            return round(time.perf_counter() - t0, 3)

        # warm the page cache with one pass each so IO isn't the variable
        probe(f"{root}/with_bloom", absent[:1])
        probe(f"{root}/no_bloom", absent[:1])

        def du(path: str) -> int:
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path) for f in fs
            )

        out = {
            "n_rows": n_rows,
            "n_probes": n_probes,
            "absent_with_bloom_s": probe(f"{root}/with_bloom", absent),
            "absent_no_bloom_s": probe(f"{root}/no_bloom", absent),
            "present_with_bloom_s": probe(f"{root}/with_bloom", present),
            "present_no_bloom_s": probe(f"{root}/no_bloom", present),
            "bytes_with_bloom": du(f"{root}/with_bloom"),
            "bytes_no_bloom": du(f"{root}/no_bloom"),
        }
        out["absent_speedup"] = round(
            out["absent_no_bloom_s"] / max(out["absent_with_bloom_s"], 1e-9), 2
        )
        print(json.dumps(out))
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "BENCH", "bloom_run.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
