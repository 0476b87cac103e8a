"""Physical-plan audit utilities.

The reference has no optimizer (SURVEY.md §4) — its pushdowns are
hand-coded per loader. Here Catalyst does the optimizing, and this module
makes the resulting plans *checkable*: tests assert that filters actually
reach the parquet scan, that projections prune the read schema, that
small dimensions broadcast instead of shuffling, and that hot paths stay
inside whole-stage codegen. That turns the "would this plan survive a
100× scale-up" review into executable assertions instead of eyeballing
`.explain()` output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """Final physical plan (AQE-resolved where possible) as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@dataclass
class PlanSummary:
    """Parsed physical-plan facts for assertions."""

    pushed_filters: list = field(default_factory=list)   # one str per scan
    read_schemas: list = field(default_factory=list)     # one str per scan
    n_scans: int = 0
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_broadcast_nl_joins: int = 0
    n_python_eval: int = 0                               # Arrow/Batch eval nodes
    has_codegen: bool = False
    text: str = ""


def _n_nodes(t: str, name: str) -> int:
    # formatted explain prints every node twice (tree + numbered detail
    # section); count only the "(n) Name" detail headers
    return len(re.findall(rf"\(\d+\) {name}", t))
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")
_SCHEMA_RE = re.compile(r"ReadSchema: (\S+)")


def summarize_plan(df: DataFrame, execute: bool = False) -> PlanSummary:
    t = formatted_plan(df)
    s = PlanSummary(text=t)
    s.n_scans = _n_nodes(t, "Scan")
    s.pushed_filters = [m.strip() for m in _PUSHED_RE.findall(t)]
    s.read_schemas = _SCHEMA_RE.findall(t)
    s.n_exchanges = _n_nodes(t, "Exchange")
    s.n_broadcast_joins = _n_nodes(t, "BroadcastHashJoin")
    s.n_sortmerge_joins = _n_nodes(t, "SortMergeJoin")
    s.n_broadcast_nl_joins = _n_nodes(t, "BroadcastNestedLoopJoin")
    s.n_python_eval = (_n_nodes(t, "ArrowEvalPython")
                       + _n_nodes(t, "MapInPandas")
                       + _n_nodes(t, "MapInArrow")
                       + _n_nodes(t, "BatchEvalPython"))
    # under AQE, codegen stage markers ("*(n)" / WholeStageCodegen) exist
    # only in the FINAL plan of an executed query — collect() drives THIS
    # DataFrame's own QueryExecution to its final adaptive plan (a write
    # would spawn a separate execution and leave this one unresolved)
    if execute:
        df.collect()
        final = plan_text(df)
        s.has_codegen = "*(" in final or "WholeStageCodegen" in final
    return s


# ---------------------------------------------------------------------------
# assertions (raise AssertionError with the plan attached)
# ---------------------------------------------------------------------------

def assert_filter_pushed(df: DataFrame, needle: str) -> PlanSummary:
    """Some scan's PushedFilters must mention `needle` (e.g. a column name
    or 'LessThanOrEqual'). A filter evaluated only above the scan reads
    every row at 100 TB."""
    s = summarize_plan(df)
    if not any(needle.lower() in p.lower() for p in s.pushed_filters):
        raise AssertionError(
            f"no pushed filter mentions {needle!r}; pushed={s.pushed_filters}\n{s.text}")
    return s


def assert_column_pruned(df: DataFrame, absent_col: str) -> PlanSummary:
    """No scan may read `absent_col` — projection pruning must reach the
    ReadSchema, otherwise the scan decodes dead columns."""
    s = summarize_plan(df)
    for schema in s.read_schemas:
        if re.search(rf"\b{re.escape(absent_col)}\b", schema):
            raise AssertionError(
                f"column {absent_col!r} still read: {schema}\n{s.text}")
    return s


def assert_broadcast_join(df: DataFrame, min_joins: int = 1) -> PlanSummary:
    """Small-dimension joins must broadcast (no shuffle of the fact side)."""
    s = summarize_plan(df)
    if s.n_broadcast_joins < min_joins:
        raise AssertionError(
            f"expected ≥{min_joins} broadcast joins, found {s.n_broadcast_joins}\n{s.text}")
    return s


def assert_max_exchanges(df: DataFrame, n: int) -> PlanSummary:
    """Shuffle budget: the plan may contain at most `n` Exchange nodes."""
    s = summarize_plan(df)
    if s.n_exchanges > n:
        raise AssertionError(
            f"plan has {s.n_exchanges} exchanges (budget {n})\n{s.text}")
    return s


def assert_no_python_in_plan(df: DataFrame) -> PlanSummary:
    """Hot-path queries must stay JVM-side (no Python eval nodes)."""
    s = summarize_plan(df)
    if s.n_python_eval:
        raise AssertionError(f"plan contains Python eval nodes\n{s.text}")
    return s
