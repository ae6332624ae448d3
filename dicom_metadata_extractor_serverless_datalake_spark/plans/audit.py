"""Plan-audit helpers: introspect a DataFrame's physical plan and assert
the properties that decide whether a query survives a 100x scale-up.

The reference has no optimizer (its physical optimizations are
hand-rolled, SURVEY §4); here Catalyst provides them — but only if the
plan is expressed so they fire. These helpers make that a *testable
contract* instead of a code-review hope:

- filters reached the parquet scan (``pushed_filters``) — otherwise the
  scan reads 100 TB to discard 99% of it downstream;
- column pruning happened (``read_schema_columns``) — a scan reading all
  columns for a 2-column projection is wrong;
- small dimensions broadcast (``broadcast_join_count``) — a sort-merge
  join against a 5-row region table shuffles the fact table for nothing;
- no accidental cartesian products (``has_cartesian``);
- shuffle count (``exchange_count``) — every Exchange is a full
  rewrite of the data over the network; plans should carry the minimum.

Used by tests/test_plans.py over the corpus' headline queries.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (final plan only — under
    AQE, explain repeats every node in an '== Initial Plan ==' section,
    which would double-count)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return plan.split("== Initial Plan ==")[0]


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of column names actually read from parquet."""
    plan = physical_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        schemas.append(cols)
    return schemas


def broadcast_join_count(df: DataFrame) -> int:
    # nodes appear once in the tree sketch and once in the numbered
    # detail section; count only the latter
    return len(
        re.findall(r"\(\d+\) (?:BroadcastHashJoin|BroadcastNestedLoopJoin)", physical_plan(df))
    )


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in physical_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))
