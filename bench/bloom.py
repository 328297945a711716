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

        # membership probes as INDIVIDUAL point lookups (fp = X), the
        # predicate shape parquet evaluates against blooms per row group
        # (large IN-lists become InSet and stop pushing down — measured).
        # present fps live in exactly 1 of 16 files: bloom skips the
        # other 15. absent fps: bloom skips all 16. Random-hex fps mean
        # min/max stats prune ~nothing, so the delta is the bloom's.
        import hashlib

        present = [r["fp"] for r in base.limit(n_probes).collect()]
        # absent fps must LOOK like real sha1s (mid-range hex) — all-zero
        # probes sit below every row group's min and min/max stats prune
        # them with no bloom at all
        absent = [hashlib.sha1(f"absent-{i}".encode()).hexdigest()
                  for i in range(n_probes)]

        df_bloom = spark.read.parquet(f"{root}/with_bloom")
        df_plain = spark.read.parquet(f"{root}/no_bloom")

        def one(df, fp: str) -> float:
            t0 = time.perf_counter()
            df.filter(F.col("fp") == fp).count()
            return time.perf_counter() - t0

        def probe_pair(fps: list[str]) -> tuple[float, float]:
            """Interleave bloom/no-bloom per lookup so the VM's
            time-correlated noise windows hit both conditions equally."""
            tb = tp = 0.0
            for fp in fps:
                tb += one(df_bloom, fp)
                tp += one(df_plain, fp)
            return round(tb, 3), round(tp, 3)

        # warm the page cache with one pass each so IO isn't the variable
        one(df_bloom, absent[0])
        one(df_plain, absent[0])

        def du(path: str) -> int:
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path) for f in fs
            )

        ab_b, ab_p = probe_pair(absent)
        pr_b, pr_p = probe_pair(present)
        out = {
            "n_rows": n_rows,
            "n_probes": n_probes,
            "absent_with_bloom_s": ab_b,
            "absent_no_bloom_s": ab_p,
            "present_with_bloom_s": pr_b,
            "present_no_bloom_s": pr_p,
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
