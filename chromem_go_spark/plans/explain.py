"""Physical-plan inspection: make plan quality testable.

The reference hand-rolls its physical strategies (SURVEY §4); here
Catalyst picks them — but "Catalyst will handle it" is only true if the
plan actually shows the pushdown/broadcast/top-k we expect. These
helpers extract the facts tests assert on:

- filters reached the Parquet scan (``PushedFilters``),
- the scan reads only needed columns (``ReadSchema``),
- single-query kNN compiles to ``TakeOrderedAndProject`` (the
  distributed analog of the reference's bounded heap, query.go:16-83),
- small sides broadcast instead of shuffling,
- how many exchanges (shuffles) a plan performs.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_flags(df: DataFrame) -> dict:
    """Structural summary of the physical plan."""
    plan = formatted_plan(df)
    return {
        "n_exchanges": len(re.findall(r"\bExchange\b|\(Exchange", plan))
        + len(re.findall(r"ShuffleExchange|Exchange hashpartitioning", plan)),
        "n_shuffles": len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", plan)),
        "has_take_ordered": "TakeOrderedAndProject" in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan
        or "BroadcastNestedLoopJoin" in plan,
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "has_whole_stage_codegen": "WholeStageCodegen" in plan
        or "codegen id" in plan,
        "has_python_eval": "ArrowEvalPython" in plan or "BatchEvalPython" in plan
        or "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan
        or "MapInArrow" in plan or "PythonMapInArrow" in plan,
        "scans": scan_info(df),
    }


def scan_info(df: DataFrame) -> list[dict]:
    """Per-Parquet-scan pushdown facts: PushedFilters + ReadSchema."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"Scan parquet[^\n]*\n(?:.*\n)*?", plan):
        pass
    # formatted explain lists scan details in the bottom section; parse
    # the attribute lines that follow each "Scan parquet" header.
    blocks = re.split(r"\n\n", plan)
    for b in blocks:
        if "Scan parquet" not in b:
            continue
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", b)
        readschema = re.search(r"ReadSchema: (struct<[^\n]*)", b)
        location = re.search(r"Location: \S+ \[([^\]]*)", b)
        out.append(
            {
                "pushed_filters": pushed.group(1).strip() if pushed else "",
                "read_schema": readschema.group(1).strip() if readschema else "",
                "location": location.group(1).strip() if location else "",
            }
        )
    return out


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Assert some Parquet scan has ``fragment`` among its PushedFilters."""
    scans = scan_info(df)
    if not any(fragment in s["pushed_filters"] for s in scans):
        raise AssertionError(
            f"no scan pushes filter containing {fragment!r}; scans: {scans}"
        )


def assert_schema_pruned(df: DataFrame, max_cols: int, table_fragment: str = "") -> None:
    """Assert the scan's ReadSchema keeps at most ``max_cols`` columns —
    i.e. column pruning reached the reader."""
    scans = scan_info(df)
    checked = False
    for s in scans:
        if table_fragment and table_fragment not in s["location"]:
            continue
        checked = True
        n = s["read_schema"].count(":") if s["read_schema"] else 0
        if n > max_cols:
            raise AssertionError(
                f"scan reads {n} columns (> {max_cols}): {s['read_schema']}"
            )
    if not checked:
        raise AssertionError(f"no scan matched {table_fragment!r}")
