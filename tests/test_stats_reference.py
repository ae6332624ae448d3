"""Third-opinion reference tests for the round-6 exact statistics.

The corpus harness checks every query against a DuckDB oracle, but the
oracle intentionally runs the SAME arithmetic shape — a conceptual
error in the formula itself would pass both engines. These tests pit
the registered queries against brute-force implementations built
directly from the textbook definitions (per-row ranks, explicit
survival products, sorted-rank Gini) on small ADVERSARIAL inputs:
all-ties, disjoint samples, singleton groups, constant series.

Inputs are written as parquet tables into a tmp dir so the queries run
through their real ``t(spark, sf_dir, table)`` path.
"""

from __future__ import annotations

import math

import pytest

from dicom_metadata_extractor_serverless_datalake_spark.queries.corpus import QUERIES


def _write_documents(spark, tmp_path, rows):
    """rows: list of (doc_id, text, lang, source, n_chars)."""
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ---- q206 Mann-Whitney vs per-row-rank brute force ----


def _mw_reference(xs, ys):
    """Textbook tie-corrected Mann-Whitney from per-row average ranks."""
    allv = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j][0] == allv[i][0]:
            j += 1
        avg = (i + 1 + j) / 2  # ranks i+1..j
        ranks.setdefault(allv[i][0], avg)
        i = j
    r1 = sum(ranks[v] for v in xs)
    n1, n2 = len(xs), len(ys)
    u1 = r1 - n1 * (n1 + 1) / 2
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(list(xs) + list(ys)).values())
    n = n1 + n2
    var = (n1 * n2 / 12.0) * ((n + 1.0) - tie / (n * (n - 1.0)))
    return n1, n2, int(2 * u1), tie, var


@pytest.mark.parametrize(
    "xs,ys",
    [
        ([100, 100, 100], [100, 100, 100]),            # all ties across groups
        ([1, 2, 3, 4], [10, 11, 12]),                  # disjoint, no ties
        ([5], [5, 5, 7]),                              # singleton group 1
        ([3, 3, 9, 9, 9], [3, 9, 9, 1]),               # heavy mixed ties
    ],
)
def test_q206_matches_rank_definition(spark, tmp_path, xs, ys):
    rows = [
        (i, "t", "en", "src0", int(v)) for i, v in enumerate(xs)
    ] + [
        (1000 + i, "t", "en", "src1", int(v)) for i, v in enumerate(ys)
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = QUERIES["q206_mann_whitney"].spark_fn(spark, sf).collect()[0]
    n1, n2, u1x2, tie, var = _mw_reference(xs, ys)
    assert (got.n1, got.n2) == (n1, n2)
    assert got.u1_x2 == u1x2
    assert got.tie_term == tie
    assert got.var_micros == math.floor(1_000_000 * var)
    if var > 0:
        z = (u1x2 - n1 * n2) / (2.0 * math.sqrt(var))
        assert got.z_micros == math.floor(1_000_000 * z)
    else:
        # degenerate design (every pooled value ties): z is undefined
        # and must surface as NULL, not a division-by-zero crash
        assert got.z_micros is None


# ---- q209 Kaplan-Meier vs explicit survival product ----


def _km_reference(lifetimes, censored):
    """(dur -> (n_risk, d, c, S(t))) from the definition."""
    pairs = sorted(zip(lifetimes, censored))
    out = {}
    s = 1.0
    n = len(pairs)
    seen = 0
    from itertools import groupby

    for dur, grp in groupby(pairs, key=lambda p: p[0]):
        grp = list(grp)
        risk = n - seen
        d = sum(1 for _, c in grp if not c)
        c = len(grp) - d
        s = s * (1.0 - d / risk)
        out[dur] = (risk, d, c, s)
        seen += len(grp)
    return out


def test_q209_matches_survival_definition(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # users with lifetimes 0,0,2,5,9,10 days; the 9/10-day users end in
    # the final 3 days of the log (max day 10) -> censored
    spans = [(1, 0), (2, 0), (3, 2), (4, 5), (5, 9), (6, 10)]
    rows = []
    eid = 0
    for uid, days in spans:
        for d in (0, days):
            rows.append(
                (eid, base + dt.timedelta(days=d), uid, "view", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.dur: (r.n_risk, r.d_events, r.c_censored, r.surv_micros)
        for r in QUERIES["q209_kaplan_meier"].spark_fn(spark, sf).collect()
    }
    # censor rule: last event > max_date - 3 -> day 10 - 3 = day 7
    lifetimes = [0, 0, 2, 5, 9, 10]
    censored = [False, False, False, False, True, True]
    want = _km_reference(lifetimes, censored)
    assert set(got) == set(want)
    for dur, (risk, d, c, s) in want.items():
        assert got[dur] == (risk, d, c, math.floor(1_000_000 * s)), dur


# ---- q210 Gini vs sorted-rank definition ----


def _gini_reference(values):
    xs = sorted(values)
    n = len(xs)
    s = sum(xs)
    a = 2 * sum((i + 1) * x for i, x in enumerate(xs))
    return (a - (n + 1) * s) / (n * s)


@pytest.mark.parametrize(
    "values",
    [
        [100, 100, 100, 100],        # perfect equality -> G = 0
        [1, 1, 1, 997],              # extreme concentration
        [5, 10, 15, 20, 50],         # mixed with no ties
        [7, 7, 7, 14, 14, 21],       # tie runs
    ],
)
def test_q210_matches_sorted_rank_definition(spark, tmp_path, values):
    rows = [(i, "t", "en", "srcA", int(v)) for i, v in enumerate(values)]
    sf = _write_documents(spark, tmp_path, rows)
    got = QUERIES["q210_gini_concentration"].spark_fn(spark, sf).collect()
    assert len(got) == 1 and got[0].source == "srcA"
    assert got[0].n_docs == len(values)
    assert got[0].total_chars == sum(values)
    assert got[0].gini_micros == math.floor(1_000_000 * _gini_reference(values))


# ---- q212 Holt vs the scalar recursion ----


def test_q212_matches_scalar_recursion(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    series = [500.0, 480.25, 470.5, 900.0, 910.75, 905.0, 890.5]
    rows = [
        (i, base + dt.timedelta(days=i), 1, "alert", v, "{}")
        for i, v in enumerate(series)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = QUERIES["q212_holt_trend"].spark_fn(spark, sf).collect()
    assert len(got) == 1
    cents = [round(v * 100) for v in series]
    a, b = 0.2, 0.1
    l, bb, e = float(cents[0]), 0.0, 0.0
    for x in map(float, cents[1:]):
        pred = l + bb
        lnew = a * x + (1.0 - a) * pred
        bnew = b * (lnew - l) + (1.0 - b) * bb
        e = e + (x - pred) * (x - pred)
        l, bb = lnew, bnew
    r = got[0]
    assert r.n_days == len(series)
    assert r.level_cents == math.floor(l)
    assert r.trend_milli == math.floor(1000.0 * bb)
    assert r.forecast7_cents == math.floor(l + 7.0 * bb)
    assert r.sse_cents2 == math.floor(e)


# ---- ANSI division-by-zero guards on degenerate slices ----


def test_q210_zero_mass_source_yields_null_gini(spark, tmp_path):
    rows = [(i, "t", "en", "srcZ", 0) for i in range(4)]
    sf = _write_documents(spark, tmp_path, rows)
    got = QUERIES["q210_gini_concentration"].spark_fn(spark, sf).collect()
    assert len(got) == 1 and got[0].total_chars == 0
    assert got[0].gini_micros is None  # undefined, not a crash


def test_q218_no_converters_yields_null_gains(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), i % 3, "view", float(i + 1), "{}")
        for i in range(12)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = QUERIES["q218_cumulative_gains"].spark_fn(spark, sf).collect()
    assert got and all(r.converters == 0 for r in got)
    assert all(r.cum_gain_micros is None for r in got)


# ---- q201 bigram LM vs dictionary brute force ----


def test_q201_matches_count_definition(spark, tmp_path):
    texts = {
        0: "a b a b c",          # bigrams: ab, ba, ab, bc
        1: "a b",                # ab
        2: "c c c",              # cc, cc
        3: "solo",               # no bigram -> absent from output
        4: "",                   # empty -> absent
    }
    rows = [(i, t_, "en", "s0", len(t_)) for i, t_ in texts.items()]
    sf = _write_documents(spark, tmp_path, rows)
    got = {
        r.doc_id: (r.n_bigrams, r.sum_micros, r.avg_micros, r.min_micros)
        for r in QUERIES["q201_bigram_lm_score"].spark_fn(spark, sf).collect()
    }
    # corpus counts from the definition
    from collections import Counter

    bg, ctx = Counter(), Counter()
    for t_ in texts.values():
        ws = [w for w in t_.split(" ") if w]
        for i in range(len(ws) - 1):
            bg[(ws[i], ws[i + 1])] += 1
            ctx[ws[i]] += 1
    want = {}
    for d, t_ in texts.items():
        ws = [w for w in t_.split(" ") if w]
        ms = [
            math.floor(1_000_000 * (bg[(ws[i], ws[i + 1])] / ctx[ws[i]]))
            for i in range(len(ws) - 1)
        ]
        if ms:
            want[d] = (len(ms), sum(ms), sum(ms) // len(ms), min(ms))
    assert got == want


# ---- q207 Markov transitions vs sequence brute force ----


def test_q207_matches_sequence_definition(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    journeys = {1: ["view", "click", "view"], 2: ["view", "view"], 3: ["click"]}
    rows = []
    eid = 0
    for uid, seq in journeys.items():
        for i, et in enumerate(seq):
            rows.append((eid, base + dt.timedelta(minutes=i), uid, et, 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.from_type, r.to_type): (r.n, r.p_micros)
        for r in QUERIES["q207_markov_transitions"].spark_fn(spark, sf).collect()
    }
    from collections import Counter

    c = Counter()
    for seq in journeys.values():
        for a, b in zip(seq, seq[1:]):
            c[(a, b)] += 1
    row_n = Counter()
    for (a, _), n in c.items():
        row_n[a] += n
    want = {
        k: (n, math.floor(1_000_000 * n / row_n[k[0]])) for k, n in c.items()
    }
    assert got == want


# ---- q208 attribution: no-preceding-touch edge ----


def test_q208_unattributed_purchase_lands_in_none(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: purchase FIRST (no touch before), then view, then purchase
        (0, base, 1, "purchase", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=2), 1, "purchase", 1.0, "{}"),
        # user 2: click then purchase
        (3, base, 2, "click", 1.0, "{}"),
        (4, base + dt.timedelta(minutes=1), 2, "purchase", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.channel: (r.last_touch_purchases, r.first_touch_purchases)
        for r in QUERIES["q208_touch_attribution"].spark_fn(spark, sf).collect()
    }
    assert got == {"(none)": (1, 1), "view": (1, 1), "click": (1, 1)}


# ---- q216 head-energy share vs brute force ----


def test_q216_matches_energy_definition(spark, tmp_path):
    vecs = {
        0: [1.0] * 32 + [0.0] * 32,   # all energy in the head -> 1.0
        1: [0.0] * 32 + [2.0] * 32,   # none in the head -> 0.0
        2: [0.5] * 64,                # uniform -> 0.5
        3: [0.0] * 64,                # zero vector -> excluded
    }
    df = spark.createDataFrame(
        [(k, [float(x) for x in v], 7) for k, v in vecs.items()],
        "vec_id bigint, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = QUERIES["q216_matryoshka_audit"].spark_fn(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0].label == 7
    assert got[0].n_vectors == 3  # the zero vector is excluded
    assert got[0].min_share_micros == 0
    assert got[0].max_share_micros == 1_000_000
    assert got[0].avg_share_micros == 1_500_000 // 3
