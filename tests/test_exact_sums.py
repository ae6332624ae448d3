"""Property tests for the exact fixed-point sum decomposition
(``queries/base.py``): every limb width (1/2/3, selected by the
declared per-row bound) must recombine to the bit-exact decimal sum
under any grouping, sign mix, and the two-level (eager-aggregation)
split. This is the determinism foundation the whole oracle-hash gate
rests on.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dicom_metadata_extractor_serverless_datalake_spark.queries.base import (
    _n_limbs,
    davg,
    dsum,
    dsum_limbs,
    dsum_merge,
)


def _exact(rows, scale=2):
    q = Decimal(1).scaleb(-scale)
    out: dict[int, Decimal] = {}
    for g, v in rows:
        # same rounding as the Spark side: half-away-from-zero on the
        # exact double, which Decimal(str()) + quantize reproduces for
        # values generated with <= `scale` true decimal digits
        out[g] = out.get(g, Decimal(0)) + Decimal(str(v)).quantize(q)
    return out


def test_n_limbs_selection():
    assert _n_limbs(None, 2) == 3
    assert _n_limbs(4e3, 2) == 1  # 4e5 scaled < 2^19
    assert _n_limbs(1e7, 2) == 2  # 1e9 scaled < 2^40
    assert _n_limbs(1e7, 4) == 2  # 1e11 scaled < 2^40
    assert _n_limbs(1e13, 2) == 3  # 1e15 scaled >= 2^40


values = st.decimals(
    min_value=Decimal("-9999999.99"),
    max_value=Decimal("9999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 3), values), min_size=1, max_size=60))
@pytest.mark.parametrize("max_abs", [None, 1e7])
def test_single_level_matches_decimal(spark, max_abs, rows):
    rows = [(g, float(v)) for g, v in rows]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r.g: r.s for r in df.groupBy("g").agg(dsum("v", "s", max_abs=max_abs)).collect()}
    want = _exact(rows)
    assert set(got) == set(want)
    for g in want:
        assert Decimal(str(got[g])) == want[g].normalize() or abs(
            Decimal(str(got[g])) - want[g]
        ) == 0


@pytest.mark.parametrize("max_abs", [None, 4e3, 1e7])
def test_sql_string_path_equals_column_path(spark, max_abs):
    """The SQL-string fast path (one F.expr parse per aggregate — the
    round-12 construction-cost optimization) must produce bit-identical
    results to the Column-operator path at every limb width, for
    dsum/davg and for composite expressions, signs and boundary values
    included."""
    rows = [
        (0, 1234.56, 0.1, 0.08),
        (0, -999999.99, 0.0, 0.0),
        (1, 0.005, 0.9, 0.99),
        (1, 1048575.99, 0.5, 0.5),  # straddles the 2^20 limb boundary scaled
        (2, -0.005, 1.0, 0.0),
        (2, 3999.99, 0.25, 0.125),
    ]
    df = spark.createDataFrame(rows, "g int, v double, d double, t double")
    comp_sql = "v * (1 - d)"
    comp_col = F.col("v") * (1 - F.col("d"))
    got_s = (
        df.groupBy("g")
        .agg(
            dsum("v", "s", max_abs=max_abs),
            dsum(comp_sql, "cs", 4, max_abs=max_abs),
            davg("v", "a", max_abs=max_abs),
        )
        .orderBy("g")
        .collect()
    )
    got_c = (
        df.groupBy("g")
        .agg(
            dsum(F.col("v"), "s", max_abs=max_abs),
            dsum(comp_col, "cs", 4, max_abs=max_abs),
            davg(F.col("v"), "a", max_abs=max_abs),
        )
        .orderBy("g")
        .collect()
    )
    assert [tuple(r) for r in got_s] == [tuple(r) for r in got_c]
    # two-level: string-input limbs + merge == Column-input limbs + merge
    lv1_s = df.groupBy("g").agg(*dsum_limbs("v", "x", 2, max_abs=max_abs))
    lv1_c = df.groupBy("g").agg(*dsum_limbs(F.col("v"), "x", 2, max_abs=max_abs))
    assert lv1_s.columns == lv1_c.columns
    ms = lv1_s.groupBy().agg(dsum_merge("x", "s", 2, max_abs=max_abs)).collect()
    mc = lv1_c.groupBy().agg(dsum_merge("x", "s", 2, max_abs=max_abs)).collect()
    assert [tuple(r) for r in ms] == [tuple(r) for r in mc]


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 2), values), min_size=1, max_size=60))
@pytest.mark.parametrize("max_abs", [None, 1e7])
def test_two_level_matches_single_level(spark, max_abs, rows):
    """dsum_limbs + dsum_merge over an arbitrary intermediate regroup
    must be bit-identical to the single-level dsum."""
    rows = [(g, float(v)) for g, v in rows]
    df = spark.createDataFrame(rows, "g int, v double")
    single = {
        r.g: r.s for r in df.groupBy("g").agg(dsum("v", "s", max_abs=max_abs)).collect()
    }
    lv1 = df.withColumn("sub", F.abs(F.hash("v")) % 3).groupBy("g", "sub").agg(
        *dsum_limbs("v", "x", 2, max_abs=max_abs)
    )
    two = {
        r.g: r.s
        for r in lv1.groupBy("g").agg(dsum_merge("x", "s", 2, max_abs=max_abs)).collect()
    }
    assert single == two
