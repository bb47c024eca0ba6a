"""Physical-plan auditing: make "did Catalyst do what we designed for?"
a testable assertion instead of an eyeball check.

The scale contract (SURVEY §4) demands: filters and projections reach
the parquet scan (PushedFilters / ReadSchema), small dims broadcast,
relational stages stay inside WholeStageCodegen, and no stage shuffles
more than the design says. tests/test_plans.py pins each of those for
the engine's load-bearing operators, so a regression that silently adds
an exchange or blocks pushdown fails CI rather than surfacing as a 10×
slowdown at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each scan (ReadSchema) — pruning evidence."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE-final where
    available). Broadcast exchanges are excluded — they're the cheap kind."""
    plan = explain_str(df)
    # formatted mode: shuffle nodes appear as "(N) Exchange"; broadcast
    # exchanges as "(N) BroadcastExchange" (excluded on purpose)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def uses_whole_stage_codegen(df_or_thunk) -> bool:
    """True if at least one WholeStageCodegen subtree exists ('codegen'
    explain mode). Under AQE the pre-execution plan reports 0 subtrees,
    so pass a zero-arg BUILDER (callable returning the DataFrame) — it is
    re-planned with AQE off just for the audit."""
    if callable(df_or_thunk):
        df = df_or_thunk()
        spark = df.sparkSession
        old = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            df = df_or_thunk()
            m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                          explain_str(df, "codegen"))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)
    else:
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                      explain_str(df_or_thunk, "codegen"))
    return bool(m) and int(m.group(1)) > 0
