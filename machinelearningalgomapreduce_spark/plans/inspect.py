"""Physical-plan inspection helpers (100 TB posture enforcement).

The scale rules in SURVEY.md §4.2 — filters reach the scan, small dims
broadcast, no stray shuffles, expressions stay in whole-stage codegen —
are assertions about the PHYSICAL plan, so tests assert them here rather
than trusting docstrings. Wraps `df.explain(...)` text; no private JVM
APIs beyond capturing what explain prints.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The text of df.explain('formatted')."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any Parquet scan in the plan received pushed-down filters."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        stripped = line.strip()
        if stripped.startswith("PushedFilters:") and stripped != "PushedFilters: []":
            return True
    return False


def scan_read_columns(df: DataFrame, table_hint: str | None = None) -> list[list[str]]:
    """Column lists each scan actually reads (ReadSchema) — the check that
    column pruning reached the parquet reader."""
    out = []
    for line in formatted_plan(df).splitlines():
        stripped = line.strip()
        if stripped.startswith("ReadSchema:"):
            if table_hint and table_hint not in stripped:
                continue
            schema = stripped.split("struct<", 1)[-1].rstrip(">")
            out.append([c.split(":")[0] for c in schema.split(",") if c])
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    and reused exchanges excluded). On an executed AQE plan only the Final
    Plan section is counted — the Initial Plan repeats every operator."""
    import re

    plan = formatted_plan(df)
    if "== Final Plan ==" in plan:
        section = plan.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
        return sum(
            1
            for line in section.splitlines()
            if re.search(r"(?<!Broadcast)(?<!Reused)Exchange \(\d+\)", line)
        )
    return sum(
        1
        for line in plan.splitlines()
        if re.fullmatch(r"\(\d+\) Exchange", line.strip())
    )


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def executed_plan(df: DataFrame) -> str:
    """Formatted plan AFTER one execution — with AQE on, only the final
    adaptive plan carries codegen annotations and runtime re-plans.
    Must execute THIS DataFrame's own QueryExecution (a noop write would
    plan a separate one), hence collect()."""
    df.collect()
    return formatted_plan(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if any stage was fused by whole-stage codegen. Requires
    execution under AQE (annotations only appear in the final plan)."""
    plan = executed_plan(df)
    return "codegen id" in plan or "WholeStageCodegen" in plan


def uses_take_ordered(df: DataFrame) -> bool:
    """True when orderBy+limit planned as TakeOrderedAndProject (top-k
    without a global sort materialization)."""
    return "TakeOrderedAndProject" in formatted_plan(df)
