"""Physical-plan auditing (no custom Catalyst rules are needed for this
engine — SURVEY §4 — so this package guards the *built-in* optimizations
we rely on at scale instead)."""

from .audit import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    has_cartesian,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)
