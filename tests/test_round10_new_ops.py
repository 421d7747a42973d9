"""Property pins for the round-10 registrations q269-q274: each new
operator against a direct pure-python computation of its textbook
definition (the test_round9_properties pattern — the DuckDB oracles
certify engine-vs-engine; these certify the math)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import (
    profile,
    text,
    ts_features,
    validation,
)
from auto_ml_platform_with_timeseries_data_spark.session import get_spark

pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PIN = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731


@settings(max_examples=8, deadline=None)
@given(cats=st.lists(st.integers(min_value=0, max_value=6),
                     min_size=1, max_size=40))
def test_hhi_matches_python_reference(cats):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(int(c),) for c in cats], "g long")
    row = profile.hhi_concentration(df, "g").collect()[0]
    counts = {c: cats.count(c) for c in set(cats)}
    n = len(cats)
    s2 = sum(v * v for v in counts.values())
    assert row["k"] == len(counts) and row["n"] == n
    assert row["hhi"] == _PIN(s2 / (n * n))
    assert row["effective_n"] == _PIN(n * n / s2)


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=1000),
                     min_size=1, max_size=40))
def test_lorenz_matches_python_reference(vals):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    got = {r["decile"]: r for r in
           profile.lorenz_curve(df, F.col("x")).collect()}
    n, tv = len(vals), sum(vals)
    # replicate the value-keyed decile assignment: distinct value v
    # with start ordinal s lands whole in decile (s*10)//n
    xs = sorted(set(vals))
    start, bins = 0, {}
    for v in xs:
        c = vals.count(v)
        d = (start * 10) // n
        rows, val = bins.get(d, (0, 0))
        bins[d] = (rows + c, val + v * c)
        start += c
    cum_r = cum_v = 0
    for d in sorted(bins):
        rows, val = bins[d]
        cum_r += rows
        cum_v += val
        r = got[d]
        assert (r["n_rows"], r["bin_value"]) == (rows, val)
        assert (r["cum_rows"], r["cum_value"]) == (cum_r, cum_v)
        want = _PIN(cum_v / tv) if tv > 0 else None
        assert r["cum_share"] == want
    assert cum_r == n and cum_v == tv
    assert set(got) == set(bins)


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=1, max_value=8),      # duration
    st.booleans()),                             # event vs censored
    min_size=2, max_size=25))
def test_nelson_aalen_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(0, int(t), 1 if e else 0) for t, e in rows],
        "cohort int, t long, e int")
    got = {r["t"]: (r["n_risk"], r["d"], r["c"], r["cum_hazard"])
           for r in ts_features.nelson_aalen(
               df, "cohort", F.col("t"), F.col("e")).collect()}
    remaining = len(rows)
    hsum = 0
    for t in sorted({t for t, _ in rows}):
        d = sum(1 for tt, e in rows if tt == t and e)
        c = sum(1 for tt, e in rows if tt == t and not e)
        hsum += math.floor(d / remaining * 1e12)
        want = _PIN(hsum / 1e12)
        assert got[t] == (remaining, d, c, want)
        remaining -= d + c


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=1, max_value=6),      # duration
    st.booleans(),                              # event
    st.booleans()),                             # group a
    min_size=4, max_size=30))
def test_logrank_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(int(t), 1 if e else 0, 1 if a else 0) for t, e, a in rows],
        "t long, e int, a int")
    row = ts_features.logrank_test(
        df, F.col("t"), F.col("e"), F.col("a")).collect()
    n_a = sum(1 for _, _, a in rows if a)
    n_b = len(rows) - n_a
    na, nb = n_a, n_b
    d_a = d_tot = es = vs = 0
    for t in sorted({t for t, _, _ in rows}):
        da = sum(1 for tt, e, a in rows if tt == t and e and a)
        db = sum(1 for tt, e, a in rows if tt == t and e and not a)
        ra = sum(1 for tt, _, a in rows if tt == t and a)
        rb = sum(1 for tt, _, a in rows if tt == t and not a)
        d, n = da + db, na + nb
        if d > 0 and n > 1:
            d_a += da
            d_tot += d
            es += math.floor(d * na / n * 1e12)
            vs += math.floor(
                d * na / n * nb / n * (n - d) / (n - 1) * 1e12)
        na -= ra
        nb -= rb
    if d_tot == 0:
        # no event times at all → the groupBy produces no row only if
        # every (t) cell was filtered; stepped rows with d=0 are
        # dropped, so the aggregate still yields one row when any cell
        # survives. Accept either an empty frame or a NULL z.
        assert len(row) == 0 or row[0]["z"] is None
        return
    r = row[0]
    assert (r["n_a"], r["n_b"], r["d_a"], r["d_total"]) == (
        n_a, n_b, d_a, d_tot)
    if vs > 0:
        z = (d_a - es / 1e12) / math.sqrt(vs / 1e12)
        assert r["z"] == _PIN(z)
        assert r["chi2"] == _PIN(z * z)
    else:
        assert r["z"] is None and r["chi2"] is None


def test_zipf_slope_planted_power_law(spark):
    """A corpus whose word frequencies ARE a Zipf law (freq r = 2^(8-r)
    per rank... no — freq(r) = floor(256/r)) must fit slope ≈ −1."""
    words = []
    for r in range(1, 21):
        words.extend([f"w{r:02d}"] * (256 // r))
    df = spark.createDataFrame([("s", " ".join(words))],
                               "source string, text string")
    row = text.zipf_slope(df, "source", "text").collect()[0]
    assert row["n_ranks"] == 20
    assert -1.1 < row["slope"] < -0.9
    # and a flat corpus (all words equally frequent) fits slope ≈ 0
    flat = " ".join([f"u{r:02d}" for r in range(30)] * 5)
    df2 = spark.createDataFrame([("s", flat)],
                                "source string, text string")
    row2 = text.zipf_slope(df2, "source", "text").collect()[0]
    assert abs(row2["slope"]) < 0.01


def test_zipf_slope_single_rank_null_by_contract(spark):
    df = spark.createDataFrame([("s", "a a a")],
                               "source string, text string")
    row = text.zipf_slope(df, "source", "text").collect()[0]
    assert row["slope"] is None and row["intercept"] is None


def test_bootstrap_matches_python_reference(spark):
    """Replicate the deterministic Poisson-bootstrap draws integer for
    integer: the multiplicity walk, every replicate sum, the pinned
    means, the integer-space SE, and the order-statistic CI."""
    rows = [(i, 100 + 37 * (i % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, v long")
    got = validation.poisson_bootstrap_mean(
        df, "i", F.col("v")).collect()[0]

    B = validation._BOOT_B
    TH = validation._POIS_THRESH
    P, K, M = (validation._BOOT_PREMOD, validation._BOOT_KNUTH,
               validation._BOOT_M32)

    def mult(i, b):
        u = (((i % P) * 64 + b) % P) * K % M
        for k, t in enumerate(TH):
            if u < t:
                return k
        return len(TH)

    n = len(rows)
    sv = sum(v for _, v in rows)
    point = _PIN(sv / n)
    bms = []
    for b in range(B):
        mv = sum(mult(i, b) * v for i, v in rows)
        m = sum(mult(i, b) for i, _ in rows)
        bms.append(_PIN(mv / m) if m > 0 else point)
    qs = [math.floor(bm * 1e6 + 0.5) for bm in bms]
    qsum = sum(qs)
    dev = sum((B * q - qsum) ** 2 for q in qs)
    se = _PIN(math.sqrt(dev / (B - 1)) / (B * 1e6))
    ms = sorted(bms)
    assert got["n"] == n
    assert got["point_mean"] == point
    assert got["boot_se"] == se
    assert got["ci_lo"] == ms[1]
    assert got["ci_hi"] == ms[B - 2]
    assert got["ci_lo"] <= got["ci_hi"]


def test_bootstrap_empty_replicate_falls_back_to_point_mean(spark):
    """With n = 1 some replicates draw multiplicity 0 — those must
    report the point mean, not NULL/div-zero."""
    df = spark.createDataFrame([(7, 500)], "i long, v long")
    got = validation.poisson_bootstrap_mean(
        df, "i", F.col("v")).collect()[0]
    assert got["n"] == 1 and got["point_mean"] == 500.0
    assert got["ci_lo"] == 500.0 and got["ci_hi"] == 500.0
    assert got["boot_se"] == 0.0
