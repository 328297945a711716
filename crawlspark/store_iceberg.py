"""Iceberg backend for the frontier store — config-gated (SURVEY §1.3).

The sandbox ships no Iceberg runtime jars, so tests run against the
snapshot-Parquet backend in ``store.py`` (same contract: atomic commits,
MERGE, time travel, rollback). On a real cluster, configure an Iceberg
catalog, e.g.::

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.crawl.type=hadoop \\
      --conf spark.sql.catalog.crawl.warehouse=s3://bucket/warehouse ...

and construct ``IcebergFrontierStore(spark, "crawl.crawldb")``. The MERGE
statements below are the executable specification of what the Parquet
backend's append+merge-on-read emulates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    try:
        cls = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    return bool(cls) and "iceberg" in cls.lower()


class IcebergFrontierStore:
    """Frontier/seen/results as real Iceberg tables (MOR, snapshots).

    Mirrors :class:`crawlspark.store.FrontierStore`'s interface; each
    method is one MERGE/INSERT so Iceberg's snapshot log provides the
    atomic per-round commit, per-file lineage, and time travel natively.
    """

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.ns = namespace
        if not iceberg_available(spark, namespace.split(".")[0]):
            raise RuntimeError(
                f"no Iceberg catalog configured for '{namespace}' — use the "
                "snapshot-Parquet backend (crawlspark.store.FrontierStore) "
                "or configure spark.sql.catalog.<name> (see module docstring)"
            )

    def create_tables(self) -> None:
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.ns}.frontier (
                fp string, url string, host string, host_bucket int,
                priority int, depth int, seq bigint, status string,
                retry_count int, discovered_round int, op_seq bigint)
            USING iceberg PARTITIONED BY (host_bucket)
            TBLPROPERTIES ('write.merge.mode'='merge-on-read',
                           'write.distribution-mode'='hash')"""
        )
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.ns}.seen (
                fp string, url string, host_bucket int, first_round int)
            USING iceberg PARTITIONED BY (host_bucket)
            TBLPROPERTIES ('write.parquet.bloom-filter-enabled.column.fp'='true')"""
        )
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.ns}.results (
                rank bigint, name string, rate double, num bigint,
                genres array<string>, url string, crawl_round int)
            USING iceberg"""
        )

    # -- the MERGE specification -------------------------------------------

    def merge_frontier(self, rows: DataFrame, round_no: int) -> None:
        rows.createOrReplaceTempView("_batch")
        self.spark.sql(
            f"""MERGE INTO {self.ns}.frontier t USING _batch s ON t.fp = s.fp
                WHEN MATCHED AND s.op_seq > t.op_seq THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *"""
        )

    def merge_seen(self, rows: DataFrame, round_no: int) -> None:
        rows.createOrReplaceTempView("_batch")
        self.spark.sql(
            f"""MERGE INTO {self.ns}.seen t USING _batch s ON t.fp = s.fp
                WHEN NOT MATCHED THEN INSERT *"""
        )

    def upsert_results(self, rows: DataFrame, round_no: int) -> None:
        rows.createOrReplaceTempView("_batch")
        self.spark.sql(
            f"""MERGE INTO {self.ns}.results t USING _batch s ON t.rank = s.rank
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *"""
        )

    def frontier_state(self, snapshot_id: int | None = None) -> DataFrame:
        if snapshot_id is not None:
            return self.spark.read.option("snapshot-id", snapshot_id).table(
                f"{self.ns}.frontier"
            )
        return self.spark.table(f"{self.ns}.frontier")

    def rollback_to_snapshot(self, snapshot_id: int) -> None:
        self.spark.sql(
            f"CALL {self.ns.split('.')[0]}.system.rollback_to_snapshot("
            f"'{self.ns}.frontier', {snapshot_id})"
        )
