"""Snapshot-versioned table store — the Iceberg contract without Iceberg jars.

The reference keeps all crawl state in Redis (ZSET frontier, SET dupefilter,
hash results — /root/reference/Douban2/settings.py:70-87,
Douban2/pipelines.py:164-188). Our engine keeps all state in versioned
tables. On a real cluster these are Iceberg tables (MERGE INTO + snapshots);
in this sandbox no Iceberg runtime jars ship with pyspark, so this module
implements the same contract natively (SURVEY.md §1.3):

* a table = a chain of immutable JSON **manifests**, each listing the data
  files (parquet directories) that make up that snapshot, plus round
  number, per-file lineage (row counts), and metrics;
* **commits are atomic**: manifest written to a temp file then os.rename'd;
  a CURRENT pointer file renamed last. A crash between data write and
  manifest commit leaves only unreferenced orphan files — exactly
  Iceberg's failure model;
* **MERGE is merge-on-read**: mutations append delta rows (with a
  monotone ``op_seq``); readers resolve latest-row-per-key with one
  window; ``compact()`` periodically rewrites the resolved state as a new
  base so the log never grows unbounded. Appending deltas instead of
  rewriting the table is what makes a 10^10-row frontier affordable —
  a round touches O(round) rows, not O(table);
* **time travel**: ``read(snapshot_id)`` reconstructs any past version —
  the replacement for the reference's Kafka offset reset/replay
  (/root/reference/url_manager/kafka_url_manager.py:184-208, SURVEY §2.1 Q9).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SnapshotStore:
    """One versioned table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        os.makedirs(f"{self.path}/manifests", exist_ok=True)
        os.makedirs(f"{self.path}/data", exist_ok=True)

    # -- snapshot chain -----------------------------------------------------

    def _current_id(self) -> int | None:
        cur = f"{self.path}/CURRENT"
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def manifest(self, snapshot_id: int | None = None) -> dict | None:
        sid = self._current_id() if snapshot_id is None else snapshot_id
        if sid is None:
            return None
        with open(f"{self.path}/manifests/{sid:08d}.json") as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(f"{self.path}/manifests")):
            if name.endswith(".json"):
                with open(f"{self.path}/manifests/{name}") as f:
                    out.append(json.load(f))
        return out

    def _max_manifest_id(self) -> int:
        ids = [
            int(n[:-5])
            for n in os.listdir(f"{self.path}/manifests")
            if n.endswith(".json")
        ]
        return max(ids, default=0)

    def _commit(self, files: list[dict], round_no: int, meta: dict | None) -> int:
        parent = self._current_id()
        # sid must exceed every manifest ever written (a rollback may have
        # moved CURRENT behind orphaned newer manifests)
        sid = self._max_manifest_id() + 1
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "round": round_no,
            "files": files,  # [{path, rows}] — per-partition lineage
            "meta": meta or {},
        }
        tmp = f"{self.path}/manifests/.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, f"{self.path}/manifests/{sid:08d}.json")
        tmp2 = f"{self.path}/.CURRENT-{uuid.uuid4().hex}"
        with open(tmp2, "w") as f:
            f.write(str(sid))
        os.rename(tmp2, f"{self.path}/CURRENT")
        return sid

    # -- data ops -------------------------------------------------------------

    def append(
        self, df: DataFrame, round_no: int, meta: dict | None = None,
        rows: int | None = None,
    ) -> int:
        """Append a delta file-set and commit a new snapshot (old files kept).

        ``rows`` lets the caller pass an already-known count for lineage;
        otherwise a (metadata-only) parquet count runs — cheap, but one
        extra job per commit.

        Small appends are coalesced to a few files: without this, every
        delta writes shuffle.partitions files, and each subsequent round
        re-lists and re-reads them all — the classic small-file problem,
        here an actual anti-scaling term (more cores -> more files ->
        slower rounds)."""
        rel = f"data/{uuid.uuid4().hex}"
        full = f"{self.path}/{rel}"
        if rows is not None:
            # repartition (a real exchange), NOT coalesce: coalesce(k)
            # collapses the upstream DAG onto k tasks, serializing the
            # whole compute; an exchange keeps upstream wide and only the
            # tiny write narrow.
            df = df.repartition(max(1, min(32, rows // 250_000 + 1)))
        df.write.mode("overwrite").parquet(full)
        if rows is None:
            rows = self.spark.read.parquet(full).count()
        prev = self.manifest()
        files = (prev["files"] if prev else []) + [{"path": rel, "rows": rows}]
        return self._commit(files, round_no, meta)

    def overwrite(self, df: DataFrame, round_no: int, meta: dict | None = None) -> int:
        """Replace table contents (compaction / base rewrite)."""
        rel = f"data/{uuid.uuid4().hex}"
        full = f"{self.path}/{rel}"
        df.write.mode("overwrite").parquet(full)
        rows = self.spark.read.parquet(full).count()
        return self._commit([{"path": rel, "rows": rows}], round_no, meta)

    def read(self, snapshot_id: int | None = None) -> DataFrame | None:
        m = self.manifest(snapshot_id)
        if m is None or not m["files"]:
            return None
        paths = [f"{self.path}/{f['path']}" for f in m["files"]]
        return self.spark.read.parquet(*paths)

    def n_delta_files(self) -> int:
        m = self.manifest()
        return len(m["files"]) if m else 0

    def rollback_to_round(self, round_no: int) -> None:
        """Move CURRENT to the newest snapshot with round <= round_no.

        Used on resume: the frontier commit is the round's atomic commit
        point; sibling tables that got ahead (killed mid-round) are rolled
        back so the reopened state is exactly the end of the last fully
        committed round (north_rule checkpoint semantics)."""
        best = None
        for m in self.snapshots():
            if m["round"] <= round_no and (best is None or m["snapshot_id"] > best):
                best = m["snapshot_id"]
        cur = f"{self.path}/CURRENT"
        if best is None:
            if os.path.exists(cur):
                os.remove(cur)
            return
        tmp = f"{self.path}/.CURRENT-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(best))
        os.rename(tmp, cur)


class FrontierStore:
    """The crawl frontier + seen-set + results, as merge-on-read tables.

    Scrapy-redis semantics made columnar:

    * ``merge_frontier`` = ZADD of pickled requests into the
      SpiderPriorityQueue (score = -priority), D1-deduped first;
    * ``mark`` = the pop-side ZREM + per-request status, as delta rows
      (op_seq resolves last-writer-wins);
    * ``merge_seen`` = SADD into the dupefilter set, insert-if-absent;
    * ``upsert_results`` = HSET all_movies keyed by rank — idempotent
      last-writer-wins upsert (/root/reference/Douban2/pipelines.py:176-183).
    """

    COMPACT_EVERY = 8  # delta files per table before a base rewrite

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.frontier = SnapshotStore(spark, f"{self.root}/frontier")
        self.seen = SnapshotStore(spark, f"{self.root}/seen")
        self.results = SnapshotStore(spark, f"{self.root}/results")
        self.metrics = SnapshotStore(spark, f"{self.root}/metrics")
        # crawl-order evidence: one row per fetched URL per round — the
        # columnar analog of the reference's scrapy crawl log, and the
        # artifact the order-parity tests compare against the simulator
        self.fetch_log = SnapshotStore(spark, f"{self.root}/fetch_log")

    # -- frontier -------------------------------------------------------------

    def frontier_log(self, snapshot_id: int | None = None) -> DataFrame | None:
        return self.frontier.read(snapshot_id)

    def frontier_state(self, snapshot_id: int | None = None) -> DataFrame | None:
        """Resolve the log to current rows: latest op_seq per fp.

        One shuffle on fp; at 10^10 scale the log is partitioned by
        host_bucket so the window is bucket-local and AQE coalesces.
        """
        log = self.frontier_log(snapshot_id)
        if log is None:
            return None
        w = Window.partitionBy("fp").orderBy(F.desc("op_seq"))
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def merge_frontier(
        self, rows: DataFrame, round_no: int, meta: dict | None = None,
        n_rows: int | None = None,
    ) -> int:
        sid = self.frontier.append(rows, round_no, meta, rows=n_rows)
        self._maybe_compact(self.frontier, self.frontier_state, round_no)
        return sid

    # -- seen -----------------------------------------------------------------

    def seen_state(self, snapshot_id: int | None = None) -> DataFrame | None:
        return self.seen.read(snapshot_id)

    def merge_seen(self, rows: DataFrame, round_no: int, n_rows: int | None = None) -> int:
        """Insert-if-absent. Caller anti-joins first; we still drop in-batch
        dupes (D3 analog) so the table is unique by fp."""
        return self.seen.append(rows.dropDuplicates(["fp"]), round_no, rows=n_rows)

    # -- results ---------------------------------------------------------------

    def results_state(self, snapshot_id: int | None = None) -> DataFrame | None:
        log = self.results.read(snapshot_id)
        if log is None:
            return None
        w = Window.partitionBy("rank").orderBy(F.desc("crawl_round"), F.asc("url"))
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def upsert_results(self, rows: DataFrame, round_no: int, n_rows: int | None = None) -> int:
        return self.results.append(rows, round_no, rows=n_rows)

    # -- metrics ----------------------------------------------------------------

    def append_metrics(self, rows: DataFrame, round_no: int, n_rows: int | None = None) -> int:
        return self.metrics.append(rows, round_no, rows=n_rows)

    def append_fetch_log(self, rows: DataFrame, round_no: int, n_rows: int | None = None) -> int:
        return self.fetch_log.append(rows, round_no, rows=n_rows)

    def fetch_log_state(self) -> DataFrame | None:
        return self.fetch_log.read()

    def metrics_state(self) -> DataFrame | None:
        return self.metrics.read()

    # -- maintenance --------------------------------------------------------------

    def _maybe_compact(self, store: SnapshotStore, resolver, round_no: int) -> None:
        if store.n_delta_files() >= self.COMPACT_EVERY:
            resolved = resolver()
            if resolved is not None:
                store.overwrite(resolved, round_no, {"compaction": True})

    def last_committed_round(self) -> int | None:
        m = self.frontier.manifest()
        return None if m is None else m["round"]
