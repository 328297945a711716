#!/usr/bin/env python
"""UT1-scale blocklist benchmark for urlfilter's DataFrame path.

The UT1 adult/ads blocklist categories a production crawl subscribes to
total ~4M hosts — far above any broadcast ceiling, so `url_filter`'s
`blocked_hosts_df` path (one left join, AQE chooses the strategy) is the
shape that matters at 100 TB. This measures that path honestly:

  - blocklist: n_blocked synthetic hosts (default 4M, the UT1 scale),
    written to parquet first so the join reads a real table, not an
    in-memory range the optimizer can collapse;
  - frontier: n_urls synthetic URLs (default 10M), ~10% on blocked
    hosts, forced through the FULL url_filter verdict (all five rules)
    and a first_fail aggregation so every row is evaluated;
  - control: the same frontier with the same rules but a literal
    3-host `isin` blocklist — isolates the join's cost from the
    regex/verdict cost.

Prints one JSON line and merges into BENCH/blocklist_run.json. The join
strategy actually chosen (broadcast vs shuffle) is read from the
executed plan and reported — at 4M hosts it must NOT be a broadcast.

Usage: python bench/blocklist_join.py [n_urls] [n_blocked] [reps]
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

from crawlspark import urlfilter as uf  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_blocked = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        "blocklist-bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 4
    )
    root = tempfile.mkdtemp(prefix="blocklistbench_")
    try:
        # blocklist on disk: host strings shaped like real registrable
        # domains; ~10% of frontier hosts intersect it.
        (
            spark.range(n_blocked)
            .select(
                F.concat(
                    F.lit("blocked"), F.col("id"), F.lit(".example.com")
                ).alias("host")
            )
            .write.mode("overwrite")
            .parquet(f"{root}/blocklist")
        )
        blocked_df = spark.read.parquet(f"{root}/blocklist")

        # frontier on disk: 10% blocked hosts (uniform over the whole
        # blocklist, so the join probes all of it), 90% clean hosts;
        # URL shapes trip each of the other rules on small slices so
        # the verdict CASE never short-circuits away.
        fid = F.col("id")
        (
            spark.range(n_urls)
            .select(
                F.concat(
                    F.lit("https://"),
                    F.when(
                        fid % 10 == 0,
                        F.concat(
                            F.lit("blocked"),
                            fid % n_blocked,
                            F.lit(".example.com"),
                        ),
                    ).otherwise(
                        F.concat(F.lit("site"), fid % 1_000_000,
                                 F.lit(".example.com"))
                    ),
                    F.lit("/p/"),
                    F.md5(fid.cast("string")),
                    F.when(fid % 31 == 0, F.lit(".jpg")).otherwise(F.lit("")),
                    F.when(
                        fid % 37 == 0, F.lit("?a=1&b=2&c=3&d=4&e=5")
                    ).otherwise(F.lit("")),
                ).alias("url")
            )
            .write.mode("overwrite")
            .parquet(f"{root}/frontier")
        )
        frontier = spark.read.parquet(f"{root}/frontier")

        def run(blocklist_df):
            kwargs = (
                {"blocked_hosts_df": blocklist_df}
                if blocklist_df is not None
                else {"blocked_hosts": ["blocked0.example.com",
                                        "blocked1.example.com",
                                        "blocked2.example.com"]}
            )
            out = uf.url_filter(frontier, **kwargs)
            t0 = time.time()
            counts = {
                r["first_fail"]: r["n"]
                for r in out.groupBy("first_fail")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            wall = time.time() - t0
            plan = out._jdf.queryExecution().executedPlan().toString()
            return wall, counts, plan

        join_walls, lit_walls = [], []
        join_counts = join_plan = None
        for _ in range(reps):
            w, join_counts, join_plan = run(blocked_df)
            join_walls.append(round(w, 2))
            w, _, _ = run(None)
            lit_walls.append(round(w, 2))

        best_join, best_lit = min(join_walls), min(lit_walls)
        result = {
            "bench": "ut1_blocklist_join",
            "n_urls": n_urls,
            "n_blocked_hosts": n_blocked,
            "reps": reps,
            "parallelism": f"local[{cpus}]",
            "join_walls_s": join_walls,
            "literal_walls_s": lit_walls,
            "best_join_s": best_join,
            "best_literal_s": best_lit,
            "join_overhead_s": round(best_join - best_lit, 2),
            "urls_per_sec_join": int(n_urls / best_join),
            "urls_per_sec_literal": int(n_urls / best_lit),
            "blocked_rows": join_counts.get("blocked_domain", 0),
            "first_fail_counts": join_counts,
            "join_is_broadcast": "BroadcastHashJoin" in join_plan,
        }
        print(json.dumps(result))
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "BENCH", "blocklist_run.json",
        )
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
