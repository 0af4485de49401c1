"""Plan-quality helpers: make `.explain("formatted")` assertions testable.

The 100 TB contract is not just "right answer" but "right plan": filters and
projections must reach the parquet scan (PushedFilters / ReadSchema), small
dimension joins must broadcast, and Python must appear only in ArrowEvalPython
nodes.  tests/test_plans.py locks these properties so a regression in plan
shape fails CI, not a cluster bill.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the scan node advertises a pushed filter containing
    ``fragment``."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line
        for line in plan.splitlines()
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the first scan's ReadSchema (column-pruning check)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [c.split(":")[0].strip() for c in inner.split(",")]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Names of Python-eval operators in the plan: ArrowEvalPython is the
    sanctioned (vectorized) kind; BatchEvalPython would be a row-at-a-time
    regression."""
    plan = formatted_plan(df)
    return [
        name
        for name in ("ArrowEvalPython", "BatchEvalPython")
        if name in plan
    ]
