"""Physical-plan introspection helpers.

The 100 TB discipline is enforced here, not hoped for: tests/test_plans.py
uses these to assert that filters reach the Parquet scan (PushedFilters),
projections prune the read schema (ReadSchema), dim joins broadcast, and
hot paths stay inside WholeStageCodegen. A query whose plan regresses
fails CI even while its results stay correct.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )
    except Exception:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def scan_read_schema(plan: str, table_hint: str) -> str:
    """ReadSchema line of the scan whose location mentions `table_hint`."""
    chunks = plan.split("Scan parquet")
    for chunk in chunks[1:]:
        if table_hint in chunk.split("ReadSchema")[0]:
            for line in chunk.splitlines():
                if "ReadSchema:" in line:
                    return line.split("ReadSchema:", 1)[1].strip()
    return ""


def pushed_filters(plan: str, table_hint: str) -> str:
    chunks = plan.split("Scan parquet")
    for chunk in chunks[1:]:
        if table_hint in chunk.split("ReadSchema")[0]:
            for line in chunk.splitlines():
                if "PushedFilters:" in line:
                    return line.split("PushedFilters:", 1)[1].strip()
    return ""


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def codegen_stage_count(plan: str) -> int:
    return plan.count("WholeStageCodegen")
