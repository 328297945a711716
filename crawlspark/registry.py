"""Node registry / heartbeat observable (P3).

The reference keeps a Redis hash of crawler nodes refreshed by 5-10 s
Kafka heartbeats (/root/reference/scripts/run_crawler.py:81-134,
url_dispatcher/node_manager.py:41-51, consumed at
url_dispatcher/url_dispatcher.py:42-72) because its processes have no
supervisor. In Spark, LIVENESS is the cluster manager's job — executors
that die are re-provisioned and their tasks rescheduled without engine
code — so the engine does not reimplement failure detection. What the
reference's registry additionally provides is an OBSERVABLE (which
nodes exist, how loaded they are), and that maps to Spark's own status
tracker: this module snapshots it per round into the ``metrics`` table
(``executors_alive``) next to the crawl counters, so a monitor reads
node liveness and round progress from one place.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def executor_registry(spark: SparkSession) -> list[dict]:
    """Live executor snapshot from Spark's status tracker — the registry
    the reference maintains by hand in Redis. One driver-side RPC; never
    touches executors."""
    # PySpark's StatusTracker wrapper doesn't surface getExecutorInfos;
    # the JVM SparkStatusTracker does (public API since Spark 2.0)
    jtracker = spark.sparkContext._jsc.sc().statusTracker()
    return [
        {"host": i.host(), "port": i.port(),
         "cache_size": i.cacheSize(),
         "num_running_tasks": i.numRunningTasks()}
        for i in jtracker.getExecutorInfos()
    ]


def heartbeat_metrics(spark: SparkSession, round_no: int) -> list[tuple]:
    """Per-round heartbeat rows for the metrics table: executor count
    and total in-flight tasks at commit time. Shaped like run_round's
    counter rows (round, metric, value)."""
    reg = executor_registry(spark)
    return [
        (round_no, "executors_alive", len(reg)),
        (round_no, "executor_running_tasks",
         sum(r["num_running_tasks"] for r in reg)),
    ]
