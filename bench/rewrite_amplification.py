#!/usr/bin/env python
"""Frontier-store rewrite-amplification bench (VERDICT r5 task 2).

The 10^10-URL design claim rests on per-round commit cost staying
~O(slice), not O(frontier): a round's merge is an APPEND of the delta
file-set (manifest fsync, no data rewrite), and the O(frontier) cost is
confined to the amortized base compaction that runs every
COMPACT_EVERY(=8) delta files. This leg measures exactly that, growing
the frontier 10^5 -> 5*10^6 rows while holding the per-round delta fixed
at 10^4 rows, and records per round: wall seconds, bytes written to the
store directory, and whether that round's commit included a compaction.

Pass criteria (asserted into the JSON, human-checked in BASELINE.md):
  - append-round bytes are ~delta-sized and FLAT across frontier sizes
    (amplification = bytes_written / delta_bytes stays O(1));
  - only compaction rounds scale with the frontier, at 1/COMPACT_EVERY
    amortization.

Writes BENCH/rewrite_amplification.json. Run:
  python bench/rewrite_amplification.py
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
from crawlspark.store import FrontierStore  # noqa: E402

SIZES = [100_000, 1_000_000, 5_000_000]
DELTA = 10_000
ROUNDS = 18  # crosses >= 2 compactions at COMPACT_EVERY=8


def frontier_rows(spark, n: int, start: int = 0, status: str = "queued"):
    return spark.range(start, start + n).select(
        F.md5(F.col("id").cast("string")).alias("fp"),
        F.concat(F.lit("https://h"), (F.col("id") % 997).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 997).cast("string"),
                 F.lit(".example.com")).alias("host"),
        (F.col("id") % 64).cast("int").alias("host_bucket"),
        F.lit(5).cast("int").alias("priority"),
        F.lit(1).cast("int").alias("depth"),
        F.col("id").cast("long").alias("seq"),
        F.lit(status).alias("status"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(0).cast("int").alias("discovered_round"),
        F.lit(1).cast("long").alias("op_seq"),
    )


def dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("rewrite-amp", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    out: dict = {"delta_rows": DELTA, "rounds": ROUNDS,
                 "compact_every": FrontierStore.COMPACT_EVERY, "sizes": {}}
    for n in SIZES:
        root = tempfile.mkdtemp(prefix=f"rewamp_{n}_")
        try:
            store = FrontierStore(spark, root + "/store")
            t0 = time.perf_counter()
            store.frontier.append(frontier_rows(spark, n), 0, rows=n)
            seed_s = round(time.perf_counter() - t0, 2)
            rounds = []
            for r in range(1, ROUNDS + 1):
                before = dir_bytes(root)
                sid_before = store.frontier._max_manifest_id()
                t0 = time.perf_counter()
                store.merge_frontier(
                    frontier_rows(spark, DELTA, start=n + r * DELTA),
                    r, n_rows=DELTA,
                )
                wall = round(time.perf_counter() - t0, 3)
                after = dir_bytes(root)
                # a compaction commits an extra manifest beyond the append's
                compacted = store.frontier._max_manifest_id() > sid_before + 1
                rounds.append({"round": r, "wall_s": wall,
                               "bytes_written": after - before,
                               "compaction": compacted})
            append_rounds = [x for x in rounds if not x["compaction"]]
            compact_rounds = [x for x in rounds if x["compaction"]]
            med = sorted(x["wall_s"] for x in append_rounds)[len(append_rounds) // 2]
            medb = sorted(x["bytes_written"] for x in append_rounds)[len(append_rounds) // 2]
            out["sizes"][str(n)] = {
                "seed_s": seed_s,
                "rounds": rounds,
                "append_round_median_s": med,
                "append_round_median_bytes": medb,
                "compaction_rounds": len(compact_rounds),
                "compaction_max_s": max((x["wall_s"] for x in compact_rounds),
                                        default=None),
                "compaction_max_bytes": max((x["bytes_written"] for x in compact_rounds),
                                            default=None),
            }
            print(n, json.dumps({k: v for k, v in out["sizes"][str(n)].items()
                                 if k != "rounds"}), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "rewrite_amplification.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH/rewrite_amplification.json")
    spark.stop()


if __name__ == "__main__":
    main()
