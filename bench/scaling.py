#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.md protocol).

The north_rule's criterion — throughput scaling efficiency >= 0.8 from N
to 4N executors — cannot use a real cluster in this sandbox; per the
driver's instruction we run the identical job/input at local[8] and
local[32] and report throughput at both plus efficiency
T32/(4*T8) into BENCH/BASELINE.md.

Usage: python bench/scaling.py [--pages 40000] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, pages: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CRAWL_PAGES=str(pages),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=40000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    r8 = run_level(8, args.pages, args.sf_dir)
    r32 = run_level(32, args.pages, args.sf_dir)

    t8 = r8["crawl"]["urls_per_sec"]
    t32 = r32["crawl"]["urls_per_sec"]
    eff = round(t32 / (4 * t8), 3)
    q8, q32 = r8["value"], r32["value"]
    qspeed = round(q8 / q32, 2)

    md = f"""# BENCH — measured results + scaling evidence

Sandbox protocol (BASELINE.md): the identical crawl job + input run at two
parallelism levels, local[8] and local[32] (N vs 4N cores standing in for
N vs 4N executors). Throughput = URLs fetched+extracted/sec, unthrottled
engine mode (politeness budgets effectively unbounded so the number is
compute-bound; the politeness-parity mode is bounded by the configured
budgets by construction — admission control, not sleeps).

| level | crawl pages | URLs fetched | wall s | URLs/s | query suite s (sf0.1) |
|---|---|---|---|---|---|
| local[8]  | {r8["crawl"]["pages"]} | {r8["crawl"]["urls_fetched"]} | {r8["crawl"]["wall_s"]} | **{t8}** | {q8} |
| local[32] | {r32["crawl"]["pages"]} | {r32["crawl"]["urls_fetched"]} | {r32["crawl"]["wall_s"]} | **{t32}** | {q32} |

**Scaling efficiency (crawl): T32 / (4 x T8) = {eff}**
Query-suite speedup local[8] -> local[32]: {qspeed}x.

Reference baseline (tooth-lab/Scrapy-redis, 2025-03-05 run, 3 nodes):
0.60 URL/s aggregate — politeness-bound, not compute-bound
(BASELINE.md). Our politeness-parity mode reproduces that schedule by
budget construction (tests/test_crawl_e2e.py politeness test); the
unthrottled numbers above are the engine-throughput comparison:
{t32} URL/s on local[32] ~= {round(t32/0.6)}x the reference's wall rate.

Raw bench JSON (both levels):

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(json.dumps({"t8": t8, "t32": t32, "efficiency": eff, "written": out_path}))


if __name__ == "__main__":
    main()
