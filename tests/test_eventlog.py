"""EventLog facade: each method must agree with the corpus query it
packages (q88/q87/q168/q174) on the same data."""

import pytest
from pyspark.sql import functions as F

from dicom_metadata_extractor_serverless_datalake_spark import EventLog
from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES
from dicom_metadata_extractor_serverless_datalake_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def events(spark):
    return load_table(spark, SF, "events")


def test_session_stats_match_q88(spark, events):
    got = EventLog(events).session_stats().collect()
    want = QUERIES["q88_sessionize_lag"].spark_fn(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sessionize_rows_and_monotone_ids(events):
    out = EventLog(events).sessionize()
    assert out.count() == events.count()
    # ids start at 1 per user and count the sessions
    agg = out.groupBy("user_id").agg(
        F.min("session_id").alias("lo"), F.max("session_id").alias("hi")
    )
    assert agg.filter(F.col("lo") != 1).count() == 0
    stats = EventLog(events).session_stats().collect()
    hi = {r.user_id: r.hi for r in agg.collect()}
    assert all(hi[r.user_id] == r.n_sessions for r in stats)


def test_funnel_matches_q87(spark, events):
    got = EventLog(events).funnel(["view", "click", "purchase"]).collect()
    want = QUERIES["q87_funnel_steps"].spark_fn(spark, SF).collect()[0]
    assert [r.users for r in got] == [
        want.viewed, want.clicked_after_view, want.purchased_after_click
    ]


def test_sequences_match_q168(spark, events):
    # the facade keeps ctx as array<string> (programmatic API); the corpus
    # query serializes it to a comma-joined scalar for the driver
    # canonicalizer — pin equality through the same serialization
    got = (
        EventLog(events.filter(F.col("user_id") % 10 == 0))
        .sequences(ctx=3)
        .withColumn("ctx", F.array_join("ctx", ","))
        .collect()
    )
    want = QUERIES["q168_event_sequences"].spark_fn(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_cv_folds_match_q174(spark, events):
    got = EventLog(events).cv_folds(folds=3, embargo_hours=6).collect()
    want = QUERIES["q174_timeseries_cv"].spark_fn(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_generic_column_names(events):
    renamed = events.selectExpr(
        "user_id AS uid", "ts AS t", "event_type AS kind", "event_id AS eid"
    )
    log = EventLog(renamed, user_col="uid", ts_col="t", type_col="kind", id_col="eid")
    base = EventLog(events).session_stats().collect()
    got = log.session_stats().collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in base]


def test_raw_ntz_parquet_input(spark, events):
    # raw reads surface TIMESTAMP_NTZ; the facade must normalize
    # internally and agree with the corpus-loader path
    raw = spark.read.parquet(f"{SF}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    got = EventLog(raw).session_stats().collect()
    want = EventLog(events).session_stats().collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_retention_matches_q86(spark, events):
    got = EventLog(events).retention().collect()
    want = QUERIES["q86_cohort_retention"].spark_fn(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_autocorrelation_matches_q189(spark, events):
    got = EventLog(events).autocorrelation().collect()
    want = QUERIES["q189_autocorrelation"].spark_fn(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_autocorrelation_custom_lags_subset(spark, events):
    # lag subset must reproduce the matching rows of the full readout
    got = EventLog(events).autocorrelation(lags=(2,)).collect()
    full = {r.lag: tuple(r) for r in EventLog(events).autocorrelation().collect()}
    assert [tuple(r) for r in got] == [full[2]]


def test_transitions_matches_q207(spark, events):
    got = sorted(
        tuple(r) for r in EventLog(events).transitions().collect()
    )
    want = sorted(
        tuple(r)
        for r in QUERIES["q207_markov_transitions"].spark_fn(spark, SF).collect()
    )
    assert got == want


def test_transitions_rows_normalize(spark, events):
    from collections import defaultdict

    rows = EventLog(events).transitions().collect()
    by_from = defaultdict(list)
    for r in rows:
        by_from[r.from_type].append(r.p_micros)
    for ps in by_from.values():
        # floored micros: sum in (1e6 - n_targets, 1e6]
        assert 1_000_000 - len(ps) < sum(ps) <= 1_000_000


def test_attribution_matches_q208(spark, events):
    got = sorted(tuple(r) for r in EventLog(events).attribution().collect())
    want = sorted(
        tuple(r)
        for r in QUERIES["q208_touch_attribution"].spark_fn(spark, SF).collect()
    )
    assert got == want


def test_attribution_counts_conserve(spark, events):
    total = events.filter(F.col("event_type") == "purchase").count()
    rows = EventLog(events).attribution().collect()
    assert sum(r.last_touch_purchases for r in rows) == total
    assert sum(r.first_touch_purchases for r in rows) == total


def test_survival_matches_q209(spark, events):
    got = sorted(tuple(r) for r in EventLog(events).survival().collect())
    want = sorted(
        tuple(r) for r in QUERIES["q209_kaplan_meier"].spark_fn(spark, SF).collect()
    )
    assert got == want


def test_survival_monotone_and_bounded(spark, events):
    rows = sorted(EventLog(events).survival().collect(), key=lambda r: r.dur)
    last = 1_000_000
    for r in rows:
        assert 0 <= r.surv_micros <= last
        last = r.surv_micros
        # everyone whose lifetime ends at t was still at risk at t
        assert r.n_risk >= r.d_events + r.c_censored


def test_holt_trend_matches_q212(spark, events):
    got = sorted(tuple(r) for r in EventLog(events).holt_trend().collect())
    want = sorted(
        tuple(r) for r in QUERIES["q212_holt_trend"].spark_fn(spark, SF).collect()
    )
    assert got == want


def test_seasonality_matches_q213(spark, events):
    got = sorted(tuple(r) for r in EventLog(events).seasonality().collect())
    want = sorted(
        tuple(r)
        for r in QUERIES["q213_dow_seasonality"].spark_fn(spark, SF).collect()
    )
    assert got == want


def test_seasonality_indices_center_on_one(spark, events):
    # day-count-weighted mean of the per-dow indices is ~1 (floored micros)
    rows = EventLog(events).seasonality().collect()
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0])
    for r in rows:
        acc[r.event_type][0] += r.idx_micros * r.n_days
        acc[r.event_type][1] += r.n_days
    for s, n in acc.values():
        assert abs(s / n - 1_000_000) < 10  # floor error only
