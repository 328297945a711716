#!/usr/bin/env python
"""EXECUTOR-SHAPED scaling pair via Spark's ``local-cluster`` master —
the round-4 answer to the driver metric (BASELINE.md: throughput scaling
efficiency >= 0.8 from N to 4N executors).

Every previous pair ran inside ONE JVM (``local[N]``), where the
instrumented failure mode was oversubscription: many Arrow python
workers + task threads sharing a single JVM heap drove 80-99% system
time at high N (BENCH/BASELINE.md, NOTES_r3). ``local-cluster[E,C,M]``
launches E REAL separate executor JVMs with C cores and M MB each —
the same process layout as spark-submit on a multi-node cluster, minus
the network — so the pair (1 executor, 4 cores) -> (4 executors,
4 cores) is literally "N executors to 4N executors" with per-executor
memory isolation, matching the north_rule's two-cluster-size criterion
as closely as a single machine can.

Modes (both over the same persistent parquet corpus, child process per
run, interleaved best-of accumulation — the VM-noise protocol of
bench/kernel_scaling.py):

* ``kernel``: the extract kernel (the crawl's per-URL compute) alone —
  the term that IS the round at 10^10-URL scale;
* ``e2e``: the full crawl engine (seed, rounds, tee commits, resume
  machinery), whose level-independent round-constant (~20-25 s/run,
  quantified in BENCH/fixed_cost.json) bounds achievable efficiency at
  sandbox corpus sizes — run it with a big corpus (300k+ pages) so the
  compute term dominates.

Executor python import path: the crawlspark package is shipped the
production way (north_rule: spark-submit --py-files) — a zip built on
the fly and registered via ``spark.submit.pyFiles``, NOT an inherited
PYTHONPATH, so this harness also exercises the cluster deploy path.

Accumulates into BENCH/cluster_runs.json; bench/scaling.py --merge
renders the summary section in BENCH/BASELINE.md.

Usage: python bench/cluster_pair.py [kernel|alu|e2e|e2eb] [n_pages]
           [pad_words] [levels e.g. 4,1] [reps] [cores_per_executor]

``e2eb`` = e2e against the production fetch-join layout
(fetch.write_bucketed_pages: url-sorted buckets + url blooms, laid out
once per corpus); also reports steady-state (round-1+) walls separately
from the seed/list-round setup.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# per-executor memory by mode: kernel/alu fit comfortably in 8 GB; the e2e
# crawl caches the round's extracted corpus (~5 GB at 100k x 8000) and needs
# real-cluster-sized executors — 24 GB each (4 x 24 = 96 GB fits this box).
# Both levels of a pair always run the IDENTICAL executor shape; override
# per-exec memory for wider pairs (e.g. 8 executors need <= 12 GB each here).
EXEC_MEM_MB = int(os.environ.get("CRAWLSPARK_EXEC_MEM_MB", "8192"))
E2E_MEM_MB = int(os.environ.get("CRAWLSPARK_E2E_MEM_MB", "24576"))


def build_pyfiles_zip() -> str:
    """Package crawlspark/ the way spark-submit --py-files would."""
    zpath = "/tmp/crawlspark_pyfiles.zip"
    src = os.path.join(REPO, "crawlspark")
    with zipfile.ZipFile(zpath, "w") as z:
        for name in sorted(os.listdir(src)):
            if name.endswith(".py"):
                z.write(os.path.join(src, name), f"crawlspark/{name}")
    return zpath


BUCKETS = 64
# DDL re-declaring the pre-written bucketed files in a fresh session's
# in-memory catalog (each measured run is a child process; the files are
# written once by ensure_bucketed_layout)
BUCKETED_DDL = """
CREATE TABLE {name} (url STRING, warc_ts TIMESTAMP, html BINARY,
                     text STRING, lang STRING)
USING parquet
CLUSTERED BY (url) SORTED BY (url) INTO {buckets} BUCKETS
LOCATION '{path}'
"""


def build_corpus(n_pages: int, pad: int, with_site: bool) -> str:
    """Reuses the xl_pair corpus layout (pages[, seeds, robots])."""
    corpus = f"/tmp/xlcrawl_corpus_{n_pages}_{pad}"
    if os.path.exists(corpus + "/pages/_SUCCESS"):
        return corpus
    # note: `import bench.xl_pair` would collide with the root bench.py
    # module; these scripts run with bench/ as sys.path[0]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xl_pair import build_corpus as xl_build

    return xl_build(n_pages, pad)


def ensure_bucketed_layout(corpus: str) -> str:
    """One-time: lay the corpus out as the production fetch-join layout
    (fetch.write_bucketed_pages — url-sorted buckets, url bloom filters,
    one file per bucket). Children re-declare it via DDL."""
    bpath = corpus + "/pages_bucketed"
    if os.path.exists(bpath + "/_SUCCESS"):
        return bpath
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from crawlspark.session import get_spark
from crawlspark.fetch import write_bucketed_pages
spark = get_spark("bucketize", master="local[8]", shuffle_partitions=8)
pages = spark.read.parquet({corpus!r} + "/pages")
write_bucketed_pages(pages, "pages_bucketed_layout", buckets={BUCKETS},
                     path={bpath!r})
spark.sql("DROP TABLE pages_bucketed_layout")  # keep the files
open({bpath!r} + "/_SUCCESS", "w").close()
print("CP_RESULT {{}}")
spark.stop()
"""
    _run_child(code)
    return bpath


def _session_code(n_exec: int, cores: int, pyz: str, mem_mb: int = EXEC_MEM_MB) -> str:
    # shuffle partitions: IDENTICAL at both levels and sized to the DATA,
    # not the core count (first attempt used n_exec*cores: at 1 executor x
    # 2 cores that made 2.5 GB partitions of the 5 GB corpus, and the
    # executor OOMed unrolling a disk-spilled cache block back into a 7 GB
    # heap — exactly the partition-sizing rule the engine documents). 16
    # keeps per-round shuffles (frontier-row-sized, tens of MB) off the
    # per-stage task-launch floor; the big scans are governed by
    # maxPartitionBytes, not this knob. AQE coalesces smaller still.
    return f"""
import sys
sys.path.insert(0, {REPO!r})
from crawlspark.session import get_spark
spark = get_spark(
    "cluster-pair",
    master="local-cluster[{n_exec},{cores},{mem_mb}]",
    shuffle_partitions=16,
    extra_conf={{
        "spark.executor.memory": "{mem_mb - 1024}m",
        "spark.executor.cores": "{cores}",
        # ship the package as --py-files would (executors' python workers
        # must import crawlspark without the driver's PYTHONPATH)
        "spark.submit.pyFiles": {pyz!r},
    }},
)
"""


def run_kernel(n_exec: int, cores: int, corpus: str, pyz: str) -> dict:
    """Two passes per session: pass 1 pays the python-worker cold start
    (numpy/pandas import per Arrow worker) and codegen; pass 2 is the
    steady-state number — the one a 10^10-URL round amortizes to. Both
    levels get identical treatment; both numbers are recorded."""
    code = _session_code(n_exec, cores, pyz) + f"""
import time
import pyspark.sql.functions as F
from crawlspark.kernels import extract_records_and_links
df = spark.read.parquet({corpus!r} + "/pages")
times = []
for _ in range(2):
    t0 = time.perf_counter()
    extract_records_and_links(df).select(
        F.length("text").alias("l"), F.size("links").alias("k")
    ).agg(F.sum("l"), F.sum("k")).collect()
    times.append(round(time.perf_counter() - t0, 2))
print("CP_RESULT " + __import__("json").dumps(
    {{"seconds": times[1], "cold_seconds": times[0]}}))
spark.stop()
"""
    return _run_child(code)


def run_alu(n_exec: int, cores: int, corpus: str, pyz: str) -> dict:
    """ALU-bound control, identical Spark machinery: a pandas-UDF whose
    working set fits in L1 (tight integer LCG over a 1k-element array),
    so it exercises executors/schedulers/Arrow exactly like the extract
    kernel but touches almost no DRAM. If THIS pair scales >= 0.8 while
    the extract kernel does not, the kernel's shortfall is the box's
    shared memory bandwidth (all 'executors' share one memory bus on a
    single VM), not Spark or the engine."""
    code = _session_code(n_exec, cores, pyz) + """
import time
import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

@pandas_udf("long")
def burn(ids: pd.Series) -> pd.Series:
    x = np.arange(1024, dtype=np.int64)
    out = np.empty(len(ids), dtype=np.int64)
    for i in range(len(ids)):
        for _ in range(60):
            x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 62) - 1)
        out[i] = int(x[0]) & 0xFFFF  # bounded: ANSI sum(long) must not overflow
    return pd.Series(out)

df = spark.range(0, 500000, 1, 64)  # ~275 us/row -> ~137 core-seconds
job = lambda: df.select(F.sum(burn("id"))).collect()
times = []
for _ in range(2):
    t0 = time.perf_counter()
    job()
    times.append(round(time.perf_counter() - t0, 2))
print("CP_RESULT " + __import__("json").dumps(
    {"seconds": times[1], "cold_seconds": times[0]}))
spark.stop()
"""
    return _run_child(code)


def run_e2e(n_exec: int, cores: int, corpus: str, pyz: str,
            bucketed: bool = False, emit_text: bool = False) -> dict:
    """Two full crawls per session against fresh stores — the same
    warm-2nd-pass protocol the kernel/alu modes use: pass 1 pays executor
    JVM spin-up, python-worker imports (numpy/pandas per Arrow worker) and
    codegen; pass 2 is the steady-state round throughput, which is what a
    10^10-URL crawl (hours of rounds in one long-lived session) amortizes
    to. Both numbers are recorded; ``seconds`` is the warm pass.

    ``bucketed``: crawl against the production fetch-join layout
    (url-sorted bucketed table + url blooms) instead of the flat parquet
    corpus — point lookups actually skip row groups, and above-gate
    slices join bucket-in-place.

    ``emit_text``: the corpus-building production mode (CrawlConfig
    .emit_text) — every round extracts byte-identical text per url in the
    Arrow kernel pass and persists it to the `corpus` output table with
    the round's atomic commit. This is the north-star workload ("URLs
    fetched+extracted/sec ... extracts byte-identical text per url from
    html"): the round's per-URL python compute (html->text) dominates,
    the same term the kernel pair isolates."""
    if bucketed:
        bpath = ensure_bucketed_layout(corpus)
        pages_src = (
            f"spark.sql('''{BUCKETED_DDL.format(name='pages_b', buckets=BUCKETS, path=bpath)}''')\n"
            "pages = spark.table('pages_b')"
        )
    else:
        pages_src = f"pages = spark.read.parquet({corpus!r} + '/pages')"
    code = _session_code(n_exec, cores, pyz, mem_mb=E2E_MEM_MB) + f"""
import json, shutil, tempfile, time
from crawlspark.runner import CrawlRunner
from crawlspark.scheduler import CrawlConfig
{pages_src}
seeds = spark.read.parquet({corpus!r} + "/seeds")
robots = spark.read.parquet({corpus!r} + "/robots")
cfg = CrawlConfig(round_wall=1e9, per_host_cap=10**6, max_depth=1,
                  emit_text={emit_text})
walls, steady_walls, steady_fetched = [], [], 0
res = None
for _ in range(2):
    root = tempfile.mkdtemp(prefix="clusterpair_store_")
    runner = CrawlRunner(spark, root, cfg)
    t0 = time.perf_counter()
    runner.init(seeds)
    r0 = runner.run(pages, robots, stop_after_round=0)
    # steady-state rounds, timed separately: at the 10^10-URL design
    # point virtually every round is a BIG round (millions of URLs per
    # executor); the seed + list round here is the crawl's warmup tail,
    # >99.9% of fetched bytes land in round 1+
    t1 = time.perf_counter()
    res = runner.run(pages, robots)
    t2 = time.perf_counter()
    walls.append(round(t2 - t0, 2))
    steady_walls.append(round(t2 - t1, 2))
    steady_fetched = res.total_fetched
    shutil.rmtree(root, ignore_errors=True)
total_fetched = r0.total_fetched + res.total_fetched
meta = json.load(open({corpus!r} + "/meta.json"))
print("CP_RESULT " + json.dumps({{
    "pages": meta["pages"], "pad_words": meta["pad_words"],
    "urls_fetched": total_fetched, "rounds": r0.rounds + res.rounds,
    "seconds": walls[1], "cold_seconds": walls[0],
    "steady_seconds": steady_walls[1], "steady_cold_seconds": steady_walls[0],
    "steady_urls_fetched": steady_fetched,
    "urls_per_sec": round(total_fetched / walls[1], 2),
    "steady_urls_per_sec": round(steady_fetched / steady_walls[1], 2)}}))
spark.stop()
"""
    return _run_child(code)


def _run_child(code: str) -> dict:
    env = dict(os.environ)
    # the worker/executor JVMs need SPARK_HOME; pyspark's pip install
    # carries it — export explicitly so the launched workers find it
    import pyspark

    env.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env)
    result = None
    for line in out.stdout.splitlines():
        if line.startswith("CP_RESULT "):
            result = json.loads(line[len("CP_RESULT "):])
        elif env.get("CRAWLSPARK_TIMING") == "1" and line.startswith("  ["):
            print(line, flush=True)  # per-phase breakdown from run_round
    if result is not None:
        return result
    raise RuntimeError(out.stdout[-3000:] + out.stderr[-3000:])


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
    pad = int(sys.argv[3]) if len(sys.argv) > 3 else 8000
    levels = [int(x) for x in (sys.argv[4] if len(sys.argv) > 4 else "4,1").split(",")]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    cores = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    corpus = build_corpus(n_pages, pad, with_site=mode.startswith("e2e"))
    pyz = build_pyfiles_zip()
    out_path = os.path.join(REPO, "BENCH", "cluster_runs.json")
    runs: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            runs = json.load(f)
    key = f"{mode}_{n_pages}x{pad}_c{cores}"
    runs.setdefault(key, {})

    def save() -> None:
        with open(out_path, "w") as f:
            json.dump(runs, f, indent=1)

    run_fn = {
        "kernel": run_kernel,
        "alu": run_alu,
        "e2e": run_e2e,
        "e2eb": lambda lv, c, co, pz: run_e2e(lv, c, co, pz, bucketed=True),
        # e2et: the corpus-building production round (emit_text) against
        # the bucketed layout — fetch + byte-identical text extraction +
        # persist, the workload the north-star metric names
        "e2et": lambda lv, c, co, pz: run_e2e(lv, c, co, pz, bucketed=True,
                                              emit_text=True),
    }[mode]
    mem_mb = E2E_MEM_MB if mode.startswith("e2e") else EXEC_MEM_MB
    for _ in range(reps):
        for lv in levels:  # interleaved: never two reps of a level adjacent
            r = run_fn(lv, cores, corpus, pyz)
            r["mem_mb"] = mem_mb  # record the per-executor shape of this run
            # wall-clock stamp: lets the renderer pair runs by machine-noise
            # window (the VM's perf regime drifts across sessions, so
            # cross-session best-ofs can pair a fast-window numerator with a
            # slow-window denominator — see NOTES_r4 scaling revision)
            import time as _time

            r["ts"] = round(_time.time(), 1)
            runs[key].setdefault(str(lv), []).append(r)
            save()
            print(json.dumps({"mode": mode, "executors": lv, "cores": cores, **r}),
                  flush=True)
    best = {lv: min(rs, key=lambda r: r["seconds"])
            for lv, rs in runs[key].items() if isinstance(rs, list)}
    sbest = {lv: min((r["steady_seconds"] for r in rs
                      if "steady_seconds" in r), default=None)
             for lv, rs in runs[key].items() if isinstance(rs, list)}
    # every measured N -> 4N executor pair (the driver metric names the
    # ratio, not a specific N): (1,4) is the headline; (2,8) adds a
    # second scale point under the documented shared-DRAM confound
    for lo, hi in (("1", "4"), ("2", "8")):
        if lo not in best or hi not in best:
            continue
        eff = round(best[lo]["seconds"] / (4 * best[hi]["seconds"]), 3)
        runs[key][f"efficiency_{lo}to{hi}"] = eff
        out = {"mode": mode, f"best_{lo}": best[lo]["seconds"],
               f"best_{hi}": best[hi]["seconds"],
               f"efficiency_{lo}exec_to_{hi}exec": eff}
        if sbest.get(lo) and sbest.get(hi):
            seff = round(sbest[lo] / (4 * sbest[hi]), 3)
            runs[key][f"steady_efficiency_{lo}to{hi}"] = seff
            out.update({f"steady_best_{lo}": sbest[lo],
                        f"steady_best_{hi}": sbest[hi],
                        f"steady_efficiency_{lo}exec_to_{hi}exec": seff})
        save()
        print(json.dumps(out))


if __name__ == "__main__":
    main()
