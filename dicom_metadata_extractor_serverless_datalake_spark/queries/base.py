"""Corpus infrastructure: query registry + determinism helpers.

Every query is registered with a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) a DuckDB oracle string. The
driver hash-compares both sides, so the corpus follows hard conventions:

- every aggregate/computed column is aliased identically on both sides;
- double aggregations go through exact DECIMAL sums and come back as
  DOUBLE (`dsum`) so results are bit-identical regardless of engine,
  partitioning, or reduction order — floating-point sums are NOT
  reduction-order-stable, decimal sums are;
- timestamps surface as DATE or ISO strings (UTC session TZ);
- LIMIT/top-k queries carry a total order with a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str
    headline: bool = False
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None,
    category: str,
    headline: bool = False,
    doc: str = "",
):
    """Register a corpus query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name, fn, oracle, category, headline, doc or (fn.__doc__ or ""))
        return fn

    return deco


def sql_query(
    name: str,
    sql: str,
    category: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
) -> None:
    """Register a query whose Spark side is ``spark.sql`` over the star
    views; by default the oracle is the *same* SQL text (the dialect
    subset shared by Spark SQL and DuckDB)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..sources.tables import register_star_schema

        register_star_schema(spark, sf_dir)
        return spark.sql(sql)

    QUERIES[name] = Query(name, run, oracle if oracle is not None else sql, category, headline, doc)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import load_table

    return load_table(spark, sf_dir, name)


def sql_max_multiplicity(arr: str) -> str:
    """Max element multiplicity of a STRING-array expression, computed
    as the longest equal-run of its sorted copy in ONE map-side fold —
    the shuffle-free form of explode -> groupBy(key, x).count() ->
    max. ``x <=> acc.prev`` is the null-safe first-element guard (the
    accumulator seeds prev with NULL); empty arrays yield 0."""
    return (
        f"aggregate(array_sort({arr}), "
        "named_struct('prev', CAST(NULL AS STRING), "
        "'run', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)), "
        "(acc, x) -> named_struct('prev', x, "
        "'run', IF(x <=> acc.prev, acc.run + 1, CAST(1 AS BIGINT)), "
        "'mx', GREATEST(acc.mx, "
        "IF(x <=> acc.prev, acc.run + 1, CAST(1 AS BIGINT)))), "
        "acc -> acc.mx)"
    )


def spread_input(df: DataFrame, key: str | F.Column | None = None) -> DataFrame:
    """Re-spread a batch frame whose SCAN yields fewer partitions than
    the cluster has slots, before CPU-heavy map-side work (hash-per-
    replicate bootstrap weights, the BPE merge cascade, per-token
    digests). Parquet splits are byte-range based, so a small-but-
    highly-compressed corpus (text compresses 10-50x) can land on 1-3
    tasks while every other core idles — AQE cannot fix this because
    the bottleneck is the scan stage's own parallelism, not a
    downstream exchange. The shuffle moves the compressed row payload
    once and only fires when the scan is actually starved (input
    partitions < defaultParallelism), so on a real multi-file 100 TB
    layout it is a no-op. Streaming frames pass through untouched
    (micro-batch sources size their own splits; .rdd is illegal on
    them). Measured: q291's 500k-doc encode 94.5 s -> 7.4 s on
    local[32] over a single 12 MB parquet file.

    ``key``: a high-cardinality column to HASH-partition by instead of
    the keyless round-robin. Every keyless ``repartition(n)`` first
    LOCALLY SORTS its input so retried tasks reproduce the same
    row-to-partition assignment (sortBeforeRepartition, guide §2.5) —
    on a scan-starved input that sort runs in the ONE task that has
    all the rows, and its buffers dominate the heap: q225's
    score-frame pass at 5M docs measured 388 s fresh-heap / 1023 s
    aged-heap round-robin vs 146 s / 180 s hash-keyed. Hashing a
    deterministic key is also strictly safer under retries (same row
    -> same partition, no sort needed) and gives every consumer the
    identical exchange child, restoring ReuseExchange where column
    pruning would otherwise specialize (and duplicate) the spread per
    consumer. Callers pass their row id (or the text column when no id
    exists); 5M distinct values over 32 partitions balance to <1%.
    ``key`` may also be a Column for frames with no unique COLUMN at
    all: callers without an id pass
    ``F.monotonically_increasing_id()`` — row-unique and SPLIT-STABLE
    (a pure function of partition index and row position, so a retried
    task reproduces the same key for the same row, unlike rand-derived
    keys — guide §2.5 / SPARK-38388), where hashing a duplicate-heavy
    data column would re-concentrate the very rows the spread exists
    to distribute (ADVICE r11 on chao1_frame)."""
    if df.isStreaming:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    # NOTE: partition count is the trigger, but the count can LIE about
    # effective parallelism: a single-file snappy parquet with one giant
    # row group presents byte-range splits (29 at 5M docs) of which only
    # the split containing the row-group start yields ANY rows — the
    # other 28 tasks read zero and one task does all the work. A
    # "starvation factor" variant (fire only when partitions*2 <= par)
    # was tried and REVERTED: it left the 5M-doc corpus on 1 effective
    # task (q187's Arrow pass sat at 800+ s single-worker vs 65 s
    # spread). The spread exchange costs seconds of text shuffle at 5M
    # docs, but it is what converts 1 effective slot into 32. Real
    # multi-file layouts present >= par partitions AND many row groups,
    # so this stays a no-op there.
    if df.rdd.getNumPartitions() < par:
        if key is not None:
            return df.repartition(par, F.col(key) if isinstance(key, str) else key)
        return df.repartition(par)
    return df


# ---- determinism helpers (Spark side) ----
#
# Exact sums run on primitive longs, not Spark's decimal Sum. A decimal
# sum (buffer decimal(28,s)) is BigDecimal-backed on the JVM: measured
# 4.4x slower than this path on a 60M-row groupBy (4.1 s vs 0.93 s for
# the full q01 aggregate at 100x sf0.1; DuckDB does the same work in
# ~1.1 s). Instead each value is rounded to an integer count of 10^-s
# units (pure-codegen double arithmetic, no allocation) and decomposed
# into three 20-bit limbs summed as longs; the limbs recombine exactly
# in decimal(38,0) after the aggregate. Everything stays inside
# whole-stage codegen.
#
# Exactness bounds: per-row |value| < 10^18 scaled units (decimal(18,s)
# envelope) keeps each limb within 2^20, so a long limb-sum cannot
# overflow below ~8.8e12 rows per group — comfortably past 100 TB of
# 150-byte rows (~7e11). Integer sums are associative/commutative, so
# results are bit-identical under any partitioning or reduction order.
#
# Rounding semantics: half-away-from-zero on the exact binary double,
# which is what DuckDB's double->decimal cast does too. (Spark's native
# cast rounds the shortest decimal repr instead; the two differ only
# for values sitting on a .xx5 boundary of the repr, which real data
# with <= s true decimal digits never produces.)

_LIMB_BITS = 20
_LIMB_LO = 1 << _LIMB_BITS
_LIMB_HI = 1 << (2 * _LIMB_BITS)


def _n_limbs(max_abs: float | None, scale: int) -> int:
    """Limb count for an exact sum of values bounded by ``max_abs``.

    A declared per-row bound lets the decomposition shed limbs without
    shrinking the ~8.8e12 rows/group overflow envelope (see module
    note): scaled values < 2^19 sum safely in ONE long (overflow at
    2^44 rows/group); < 2^40 split into two 20-bit-aligned limbs
    (lo < 2^20, hi < 2^20 -> 2^43 rows/group). Unbounded columns keep
    the full three-limb form (< 2^60 scaled). Fewer limbs = fewer
    aggregate buffers = measurably faster wide aggregations (q01 runs
    15 three-limb sums without this).
    """
    if max_abs is None:
        return 3
    scaled = abs(max_abs) * (10**scale)
    if scaled < float(1 << 19):
        return 1
    if scaled < float(1 << 40):
        return 2
    return 3


def _scaled_sum_sql(e: str, scale: int, max_abs: float | None) -> str:
    """:func:`_exact_scaled_sum` rendered as ONE SQL string over the SQL
    expression ``e`` — the identical tree (same literals, same casts,
    same limb arithmetic), built with a single parser call instead of a
    py4j round-trip per operator node. Construction cost is driver-side
    and paid on EVERY query build (the bench reconstructs each query per
    pass): q01's seven dsum/davg aggregates measured 152 ms per build on
    the F.*-operator path; the parsed form is ~4x cheaper. Exactness is
    pinned by tests/test_exact_sums.py's string-vs-Column equivalence
    test and the oracle sweep."""
    lit10 = repr(float(10**scale))
    half = f"(CASE WHEN ({e}) >= 0 THEN 0.5D ELSE -0.5D END)"
    s = f"CAST((CAST(({e}) AS DOUBLE) * {lit10}D + {half}) AS BIGINT)"
    n = _n_limbs(max_abs, scale)
    if n == 1:
        return f"CAST(SUM({s}) AS DECIMAL(38,0))"
    lo = f"CAST(SUM(({s} & {_LIMB_LO - 1})) AS DECIMAL(38,0))"
    if n == 2:
        hi = f"CAST(SUM(SHIFTRIGHT({s}, {_LIMB_BITS})) AS DECIMAL(38,0))"
        return f"({hi} * {_LIMB_LO} + {lo})"
    hi = f"CAST(SUM(SHIFTRIGHT({s}, {2 * _LIMB_BITS})) AS DECIMAL(38,0))"
    mid = (
        f"CAST(SUM((SHIFTRIGHT({s}, {_LIMB_BITS}) & {_LIMB_LO - 1})) "
        "AS DECIMAL(38,0))"
    )
    return f"({hi} * {_LIMB_HI} + {mid} * {_LIMB_LO} + {lo})"


def _exact_scaled_sum(c: F.Column, scale: int, max_abs: float | None = None) -> F.Column:
    """Exact SUM(round(c * 10^scale)) as decimal(38,0) via long limbs."""
    half = F.when(c >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    s = (c.cast("double") * F.lit(float(10**scale)) + half).cast("long")
    n = _n_limbs(max_abs, scale)
    if n == 1:
        return F.sum(s).cast("decimal(38,0)")
    lo = F.sum(s.bitwiseAND(F.lit(_LIMB_LO - 1)))
    if n == 2:
        # s = (s >> 20) * 2^20 + (s & mask) holds for negatives too
        # (arithmetic shift = floor division, mask = mod 2^20)
        hi = F.sum(F.shiftright(s, _LIMB_BITS))
        return hi.cast("decimal(38,0)") * F.lit(_LIMB_LO) + lo.cast("decimal(38,0)")
    hi = F.sum(F.shiftright(s, 2 * _LIMB_BITS))
    mid = F.sum(F.shiftright(s, _LIMB_BITS).bitwiseAND(F.lit(_LIMB_LO - 1)))
    return (
        hi.cast("decimal(38,0)") * F.lit(_LIMB_HI)
        + mid.cast("decimal(38,0)") * F.lit(_LIMB_LO)
        + lo.cast("decimal(38,0)")
    )


def dsum_expr(
    col: str | F.Column, scale: int = 2, max_abs: float | None = None
) -> F.Column:
    """Unaliased exact fixed-point sum as double, for use inside larger
    expressions (variance formulas, scalar subqueries). A ``str`` input
    is an SQL EXPRESSION (a bare column name is one), parsed in a single
    F.expr call — see :func:`_scaled_sum_sql`."""
    if isinstance(col, str):
        return F.expr(
            f"CAST(({_scaled_sum_sql(col, scale, max_abs)} / {10**scale}) AS DOUBLE)"
        )
    return (_exact_scaled_sum(col, scale, max_abs) / F.lit(10**scale)).cast("double")


def dsum_limbs(
    col: str | F.Column, prefix: str, scale: int = 2, max_abs: float | None = None
) -> list[F.Column]:
    """First level of a two-level exact sum: per-group limb partial sums
    as plain longs (``{prefix}_hi/_mid/_lo``). Because integer limb sums
    are associative, re-summing these partials with :func:`dsum_merge`
    over any regrouping is bit-identical to a single-level :func:`dsum`
    over the underlying rows — this is what lets an aggregation be
    pushed below a join (eager aggregation) without losing exactness.
    The overflow envelope is unchanged (the merged sum covers the same
    row set, ~8.8e12 rows/group; see module note)."""
    n = _n_limbs(max_abs, scale)
    if isinstance(col, str):
        # SQL-string fast path (identical tree — see _scaled_sum_sql)
        lit10 = repr(float(10**scale))
        half = f"(CASE WHEN ({col}) >= 0 THEN 0.5D ELSE -0.5D END)"
        s = f"CAST((CAST(({col}) AS DOUBLE) * {lit10}D + {half}) AS BIGINT)"
        if n == 1:
            return [F.expr(f"SUM({s}) AS {prefix}_lo")]
        out = [F.expr(f"SUM(({s} & {_LIMB_LO - 1})) AS {prefix}_lo")]
        if n == 2:
            return [
                F.expr(f"SUM(SHIFTRIGHT({s}, {_LIMB_BITS})) AS {prefix}_hi"),
                *out,
            ]
        return [
            F.expr(f"SUM(SHIFTRIGHT({s}, {2 * _LIMB_BITS})) AS {prefix}_hi"),
            F.expr(
                f"SUM((SHIFTRIGHT({s}, {_LIMB_BITS}) & {_LIMB_LO - 1})) AS {prefix}_mid"
            ),
            *out,
        ]
    c = col
    half = F.when(c >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    s = (c.cast("double") * F.lit(float(10**scale)) + half).cast("long")
    out = [F.sum(s.bitwiseAND(F.lit(_LIMB_LO - 1))).alias(f"{prefix}_lo")]
    if n == 1:
        return [F.sum(s).alias(f"{prefix}_lo")]
    if n == 2:
        return [F.sum(F.shiftright(s, _LIMB_BITS)).alias(f"{prefix}_hi"), *out]
    return [
        F.sum(F.shiftright(s, 2 * _LIMB_BITS)).alias(f"{prefix}_hi"),
        F.sum(F.shiftright(s, _LIMB_BITS).bitwiseAND(F.lit(_LIMB_LO - 1))).alias(f"{prefix}_mid"),
        *out,
    ]


def dsum_merge(
    prefix: str,
    alias: str,
    scale: int = 2,
    max_abs: float | None = None,
    df: DataFrame | None = None,
) -> F.Column:
    """Second level of a two-level exact sum: merge ``dsum_limbs``
    partials across the outer grouping and surface the exact total as
    double, matching single-level :func:`dsum` bit-for-bit. Pass ``df``
    (the frame holding the partials) to derive the limb width from which
    ``{prefix}_hi/_mid/_lo`` columns actually exist — ``_lo`` exists at
    every width, so a ``max_abs`` that disagrees with the ``dsum_limbs``
    call would otherwise silently drop the high limbs. With ``df`` the
    mismatch raises instead; the per-outer-group overflow envelope is
    the same as the single-level form since the merged sum covers the
    same row set."""
    n = _n_limbs(max_abs, scale)
    if df is not None:
        cols = set(df.columns)
        present = 1 + (f"{prefix}_hi" in cols) + (f"{prefix}_mid" in cols)
        if f"{prefix}_lo" not in cols:
            raise ValueError(f"dsum_merge: no {prefix}_lo column in input frame")
        if max_abs is not None and present != n:
            raise ValueError(
                f"dsum_merge: frame has {present} '{prefix}' limb column(s) "
                f"but max_abs={max_abs!r} selects {n} — it must match the "
                f"dsum_limbs call that built them"
            )
        n = present
    dec = lambda c: f"CAST(SUM({c}) AS DECIMAL(38,0))"  # noqa: E731
    if n == 1:
        total = dec(f"{prefix}_lo")
    elif n == 2:
        total = f"({dec(f'{prefix}_hi')} * {_LIMB_LO} + {dec(f'{prefix}_lo')})"
    else:
        total = (
            f"({dec(f'{prefix}_hi')} * {_LIMB_HI}"
            f" + {dec(f'{prefix}_mid')} * {_LIMB_LO}"
            f" + {dec(f'{prefix}_lo')})"
        )
    return F.expr(f"CAST(({total} / {10**scale}) AS DOUBLE)").alias(alias)


def dsum(
    col: str | F.Column, alias: str, scale: int = 2, max_abs: float | None = None
) -> F.Column:
    """Exact fixed-point sum surfaced as double: deterministic under any
    partitioning/order, unlike a native double sum (see module note on
    the long-limb decomposition). The oracle side sums at decimal(28)
    and still hash-matches because both sides are exact. ``max_abs``
    (a per-row |value| bound known from the schema/domain) lets the
    decomposition drop to 2 or 1 limbs — same exactness, same
    ~8.8e12 rows/group envelope, fewer aggregate buffers."""
    return dsum_expr(col, scale, max_abs).alias(alias)


def davg(
    col: str | F.Column, alias: str, scale: int = 2, max_abs: float | None = None
) -> F.Column:
    if isinstance(col, str):
        return F.expr(
            f"(CAST(({_scaled_sum_sql(col, scale, max_abs)} / {10**scale}) AS DOUBLE)"
            f" / COUNT(({col})))"
        ).alias(alias)
    return (dsum_expr(col, scale, max_abs) / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """Oracle-side twin of dsum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
