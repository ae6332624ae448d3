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
    """The formatted physical plan as a string, FINAL plan only.

    Two AQE layouts need normalizing (both would otherwise corrupt the
    audit):

    - finalized plans append a trailing '== Initial Plan ==' section
      that repeats nodes — truncated (the historical behavior);
    - plans whose construction materialized a cached subframe embed a
      '+- == Initial Plan ==' marker INSIDE the tree, BEFORE the node
      detail sections. Naive truncation there cuts every detail section
      — this shipped an all-zero PLANS.md row for eleven queries and
      would let substring assertions pass vacuously. Here the initial
      SUBTREE is removed from the tree and only the detail sections
      belonging exclusively to it are dropped (stage ids shared with
      the final plan are kept)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return _normalize_formatted(buf.getvalue())


def _normalize_formatted(raw: str) -> str:
    """Pure normalization of ``explain('formatted')`` text (see
    :func:`physical_plan`); split out so canned explain strings for
    both AQE layouts can be unit-tested without a live plan
    (tests/test_plans.py::test_normalize_formatted_*)."""
    lines = raw.splitlines()
    first_detail = next(
        (i for i, l in enumerate(lines) if re.match(r"^\(\d+\) ", l)), None
    )
    if first_detail is None:
        return raw.split("== Initial Plan ==")[0]
    tree, rest = lines[:first_detail], lines[first_detail:]
    marker = next(
        (i for i, l in enumerate(tree) if "== Initial Plan ==" in l), None
    )
    if marker is not None:
        final_ids = set(re.findall(r"\((\d+)\)", "\n".join(tree[:marker])))
        init_ids = set(re.findall(r"\((\d+)\)", "\n".join(tree[marker:])))
        drop = init_ids - final_ids
        tree = tree[:marker]
        kept, keep = [], True
        for line in rest:
            if "== Initial Plan ==" in line:
                break  # trailing duplicate section after the details
            m = re.match(r"^\((\d+)\) ", line)
            if m:
                keep = m.group(1) not in drop
            if keep:
                kept.append(line)
        return "\n".join(tree + kept)
    return "\n".join(tree) + "\n" + "\n".join(rest).split("== Initial Plan ==")[0]


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
