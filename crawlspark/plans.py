"""Physical-plan inspection helpers.

The scale contract isn't just "right answers" — it's "right plans":
filters reach the parquet scan (PushedFilters), small dims broadcast,
expressions stay inside WholeStageCodegen, the pop window shuffles once.
These helpers turn those properties into pytest assertions
(tests/test_plans.py) so a regression that silently de-optimizes a plan
fails CI, not a 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def has_pushed_filters(df: DataFrame) -> bool:
    s = explain_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan — column-pruning
    evidence."""
    s = explain_str(df)
    for line in s.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            cols = line.split("struct<", 1)[-1].rstrip(">")
            return [c.split(":")[0] for c in cols.split(",") if c]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    # 'codegen' mode materializes the codegen subtrees even under AQE
    # (simple mode shows only 'AdaptiveSparkPlan isFinalPlan=false' before
    # execution)
    return explain_str(df, "codegen").count("WholeStageCodegen subtree")


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the final plan (AQE-resolved where possible)."""
    return explain_str(df, "simple").count("Exchange")


def has_python_udf(df: DataFrame) -> bool:
    s = explain_str(df)
    return "BatchEvalPython" in s or "ArrowEvalPython" in s or "pythonUDF" in s
