"""Property-based tests (SURVEY.md §5 item 3) — the two declared
families beyond the window-count property in test_timeseries.py:
scaler round-trips and confusion-matrix marginals."""

from __future__ import annotations

import math

import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from auto_ml_platform_with_timeseries_data_spark.operators import (  # noqa: E402
    evaluation,
    scaling,
)
from auto_ml_platform_with_timeseries_data_spark.session import get_spark  # noqa: E402

_vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=3, max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(xs=_vals)
def test_standard_scale_round_trip(xs):
    """x == scaled·σ + μ for every row, and the scaled train column has
    mean ≈ 0 (σ from the train fit) — unless the column is constant."""
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(float(v),) for v in xs], "x double")
    n = len(xs)
    mu = sum(xs) / n
    sigma = math.sqrt(sum((v - mu) ** 2 for v in xs) / n)
    if sigma == 0:
        # constant column: (x−μ)/σ undefined -> NULL by contract
        out = scaling.standard_scale(df, df, ["x"]).collect()
        assert all(r["x_scaled"] is None for r in out)
        return
    out = scaling.standard_scale(df, df, ["x"]).collect()
    for r in out:
        assert math.isclose(r["x_scaled"] * sigma + mu, r["x"],
                            rel_tol=1e-9, abs_tol=1e-6)
    mean_scaled = sum(r["x_scaled"] for r in out) / n
    assert abs(mean_scaled) < 1e-6


@settings(max_examples=10, deadline=None)
@given(xs=_vals)
def test_min_max_scale_bounds_and_round_trip(xs):
    """Scaled train values live in [0, 1]; x == scaled·(max−min) + min."""
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(float(v),) for v in xs], "x double")
    lo, hi = min(xs), max(xs)
    if hi == lo:
        # degenerate range -> NULL by contract
        out = scaling.min_max_scale(df, df, ["x"]).collect()
        assert all(r["x_scaled"] is None for r in out)
        return
    out = scaling.min_max_scale(df, df, ["x"]).collect()
    for r in out:
        assert -1e-12 <= r["x_scaled"] <= 1 + 1e-12
        assert math.isclose(r["x_scaled"] * (hi - lo) + lo, r["x"],
                            rel_tol=1e-9, abs_tol=1e-6)


@settings(max_examples=10, deadline=None)
@given(labels=st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1)),
                       min_size=1, max_size=60))
def test_confusion_marginals_equal_class_counts(labels):
    """tp+fn = positives, fp+tn = negatives, tp+fp = predicted
    positives, and the 2×2 total = row count; F1 matches the formula."""
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(int(t), int(p)) for t, p in labels],
                               "t int, p int")
    r = evaluation.confusion_and_f1(df, "t", "p").first()
    n_pos = sum(1 for t, _ in labels if t == 1)
    n_neg = len(labels) - n_pos
    n_pred_pos = sum(1 for _, p in labels if p == 1)
    assert r["tp"] + r["fn"] == n_pos
    assert r["fp"] + r["tn"] == n_neg
    assert r["tp"] + r["fp"] == n_pred_pos
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == len(labels)
    denom = 2 * r["tp"] + r["fp"] + r["fn"]
    if denom:
        assert math.isclose(r["f1"], 2 * r["tp"] / denom, abs_tol=1e-6)
    # pivot form agrees with the flat counts
    piv = {row["truth"]: row for row in
           evaluation.confusion_matrix_pivot(df, "t", "p").collect()}
    if 1 in piv:
        assert piv[1]["pred_1"] == r["tp"] and piv[1]["pred_0"] == r["fn"]
    if 0 in piv:
        assert piv[0]["pred_1"] == r["fp"] and piv[0]["pred_0"] == r["tn"]


@settings(max_examples=10, deadline=None)
@given(mask=st.lists(st.tuples(st.booleans(), st.booleans(), st.booleans()),
                     min_size=1, max_size=30))
def test_all_nan_column_detection_property(mask):
    """P2 (data_analysis.py:23-28): for ANY null pattern, exactly the
    all-null columns are reported and dropped; partially-null columns
    survive."""
    from auto_ml_platform_with_timeseries_data_spark.operators import profile

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    rows = [tuple(float(i) if keep else None for keep in row)
            for i, row in enumerate(mask)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    expect = [c for c, j in zip("abc", range(3))
              if all(not row[j] for row in mask)]
    assert profile.all_nan_columns(df) == expect
    kept, removed = profile.drop_all_nan_columns(df)
    assert removed == expect
    assert kept.columns == [c for c in "abc" if c not in expect]


_doc_text = st.text(
    alphabet=st.sampled_from(list("abc def# .the and\n\tz")),
    min_size=0, max_size=120,
)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_doc_text, min_size=1, max_size=8))
def test_gopher_flags_match_python_reference(texts):
    """The five JVM-expression quality rules agree with a direct Python
    reimplementation on arbitrary text (whitespace runs, empty docs,
    symbol runs, missing stopwords)."""
    import re

    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        _STOPWORDS,
        gopher_quality_flags,
    )

    def ref(t: str):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        toks = norm.split(" ")
        nw = len(toks)
        mwl = (len(norm) - (nw - 1)) / nw
        sym = t.count("#") + (len(t) - len(t.replace("...", ""))) // 3
        alpha = sum(1 for x in toks if re.search("[a-z]", x))
        stops = len(set(toks) & set(_STOPWORDS))
        return (5 <= nw <= 2000, 2.0 <= mwl <= 12.0, sym * 10 < nw,
                alpha * 5 >= nw * 4, stops >= 2)

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    rows = [(i, t, "en") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["r_words"], r["r_wordlen"], r["r_symbol"],
                         r["r_alpha"], r["r_stop"])
           for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    for i, t in enumerate(rows):
        assert got[i] == ref(t[1]), (t[1], got[i], ref(t[1]))


@settings(max_examples=8, deadline=None)
@given(ops=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),      # key
              st.sampled_from(["I", "U", "D"]),            # op
              st.integers(min_value=-1000, max_value=1000)),  # value
    min_size=1, max_size=24))
def test_cdc_apply_matches_python_reference(ops):
    """cdc_apply == a sequential Python replay of the log in seq order,
    for ANY op mix (insert/update/delete, repeated keys, delete-first,
    resurrect-after-delete)."""
    from auto_ml_platform_with_timeseries_data_spark.operators.layout import (
        cdc_apply,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    rows = [(k, op, i + 1, float(v)) for i, (k, op, v) in enumerate(ops)]
    log = spark.createDataFrame(rows, "k long, op string, seq long, v double")

    state: dict = {}
    for k, op, seq, v in rows:                       # replay in seq order
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (seq, v)
    got = {r["k"]: (r["last_seq"], r["v"])
           for r in cdc_apply(log, "k").collect()}
    # keys whose final op was D are absent from both models;
    # resurrections (I after D) survive in both
    assert got == state


@settings(max_examples=8, deadline=None)
@given(keys=st.lists(st.integers(min_value=0, max_value=30),
                     min_size=1, max_size=60))
def test_countmin_never_underestimates(keys):
    """One-sided error on arbitrary key multisets."""
    from collections import Counter

    from auto_ml_platform_with_timeseries_data_spark.operators.graph import (
        countmin_estimates,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    exact = Counter(keys)
    rows = countmin_estimates(df, "user_id").collect()
    assert len(rows) == len(exact)
    for r in rows:
        assert r["exact"] == exact[r["key"]]
        assert r["est"] >= r["exact"]


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),      # hour bucket
              st.integers(min_value=-500, max_value=500)),  # cents
    min_size=1, max_size=30),
    cut=st.integers(min_value=0, max_value=29))
def test_rollup_merge_any_split_equals_one_shot(vals, cut):
    """Splitting the event stream at ANY point and merging the two
    partials equals the one-shot rollup — the associativity that makes
    q204's maintained aggregate correct under any batch boundaries."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        rollup_merge,
        rollup_partial,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    rows = [(dt.datetime(2024, 1, 1, h, 30), c / 100.0) for h, c in vals]
    cut = min(cut, len(rows) - 1)
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    one = {r["bucket"]: (r["n_events"], r["sum_cents"])
           for r in rollup_partial(ev).collect()}
    a = spark.createDataFrame(rows[:cut] or [(dt.datetime(2024, 1, 1), 0.0)],
                              "ts timestamp, value double")
    b = spark.createDataFrame(rows[cut:], "ts timestamp, value double")
    if cut == 0:
        merged_df = rollup_partial(b)
    else:
        merged_df = rollup_merge(rollup_partial(a), rollup_partial(b))
    merged = {r["bucket"]: (r["n_events"], r["sum_cents"])
              for r in merged_df.collect()}
    assert merged == one


@settings(max_examples=6, deadline=None)
@given(cols=st.lists(
    st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False,
                       allow_infinity=False),
             min_size=5, max_size=5),
    min_size=8, max_size=20))
def test_corr_matrix_matches_python_reference(cols):
    """q207's sufficient-statistics correlations == the textbook
    two-pass formula on the quantized values, for arbitrary data."""
    from auto_ml_platform_with_timeseries_data_spark.operators.profile import (
        corr_matrix,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    names = ["a", "b", "c", "d", "e"]
    df = spark.createDataFrame(
        [tuple(float(v) for v in row) for row in cols],
        ", ".join(f"{n} double" for n in names))
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_matrix(df, names).collect()}
    q = [[math.floor(v * 100 + 0.5) for v in row] for row in cols]
    n = len(q)
    for i in range(5):
        for j in range(i + 1, 5):
            xs = [r[i] for r in q]
            ys = [r[j] for r in q]
            sx, sy = sum(xs), sum(ys)
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            den = (n * sxx - sx * sx) * (n * syy - sy * sy)
            key = (names[i], names[j])
            if den <= 0:
                # constant column: corr undefined -> NULL by contract
                assert got[key] is None
                continue
            ref = (n * sxy - sx * sy) / math.sqrt(den)
            assert abs(got[key] - ref) < 2e-6, key


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=2, max_size=8),
    min_size=2, max_size=12))
def test_blocking_best_match_equals_bruteforce_within_blocks(texts):
    """q197's blocked argmax == brute-force best Jaccard over the pairs
    the blocking admits, with the (score desc, id asc) tie-break."""
    from auto_ml_platform_with_timeseries_data_spark.operators.linkage import (
        blocking_best_match,
    )

    docs = [(i, " ".join(t), "en") for i, t in enumerate(texts)]
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    left = df.filter("doc_id % 2 = 0")
    right = df.filter("doc_id % 2 = 1")
    got = {r["left_id"]: (r["match_id"], r["score_ppm"]) for r in
           blocking_best_match(left, right, "doc_id", "text", "lang",
                               length_bucket=4).collect()}

    def key(t):
        return ("en", t[0], len(t) // 4)

    def score(a, b):
        inter = len(set(a) & set(b))
        union = len(set(a)) + len(set(b)) - inter
        return inter * 1_000_000 // union

    expect = {}
    for i, t in enumerate(texts):
        if i % 2 != 0:
            continue
        cands = [(score(t, u), -j) for j, u in enumerate(texts)
                 if j % 2 == 1 and key(u) == key(t)]
        if cands:
            s, nj = max(cands)
            expect[i] = (-nj, s)
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(xs=st.lists(st.floats(min_value=-1e4, max_value=1e4,
                             allow_nan=False, allow_infinity=False),
                   min_size=4, max_size=16),
       ys=st.lists(st.floats(min_value=-1e4, max_value=1e4,
                             allow_nan=False, allow_infinity=False),
                   min_size=4, max_size=16))
def test_quantile_normalize_matches_python_reference(xs, ys):
    """The engine's quantile-normalization mapping equals a direct
    pure-python evaluation of the definition (same integer algebra):
    profile(i) = (Σ_col cents_col(i) · 10000) div 2, tied values
    average their span's profile entries. Implies the defining
    property — both columns transform onto the same profile."""
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(list(zip(xs, ys)), "a double, b double")
    got = {(r["feature"], r["value_cents"]): (r["n"], r["norm_micro"])
           for r in scaling.quantile_normalize_map(
               df, ["a", "b"]).collect()}

    def cents(v):
        return math.floor(v * 100 + 0.5)

    ca = sorted(cents(v) for v in xs)
    cb = sorted(cents(v) for v in ys)
    prof = [((ca[i] + cb[i]) * 10000) // 2 for i in range(n)]
    want = {}
    for name, col in (("a", ca), ("b", cb)):
        for v in set(col):
            span = [i for i, c in enumerate(col) if c == v]
            rm = sum(prof[i] for i in span)
            want[(name, v)] = (len(span), rm // len(span))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.tuples(
    st.floats(min_value=-100, max_value=100,
              allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=1)),
    min_size=4, max_size=30))
def test_roc_auc_matches_python_reference(rows):
    """AUC equals the direct pairwise probability
    P(score_pos > score_neg) + 0.5·P(tie) computed in pure python."""
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(rows, "s double, y int")
    got = evaluation.roc_auc(df, F.col("s"), F.col("y")).first()
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        assert got["auc"] is None
        return
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0
               for p in pos for q in neg)
    want = wins / (len(pos) * len(neg))
    assert abs(got["auc"] - want) < 2e-6


@settings(max_examples=6, deadline=None)
@given(edges=st.sets(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                     min_size=1, max_size=25),
       k=st.integers(min_value=1, max_value=3))
def test_k_core_peel_matches_python_fixpoint(edges, k):
    """With enough rounds the synchronized peel reaches the true
    k-core: survivors and degrees equal a pure-python peel run to
    fixpoint."""
    from auto_ml_platform_with_timeseries_data_spark.operators.graph import (
        k_core_peel,
    )

    simple = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not simple:
        return
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(simple, "a long, b long")
    # 10 nodes -> at most 10 peel rounds to fixpoint
    got = {r["vertex"]: r["degree"]
           for r in k_core_peel(df, k=k, rounds=10).collect()}
    adj: dict[int, set[int]] = {}
    for a, b in simple:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        dead = {u for u in alive
                if sum(1 for v in adj[u] if v in alive) < k}
        if not dead:
            break
        alive -= dead
    want = {u: sum(1 for v in adj[u] if v in alive)
            for u in alive}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.tuples(
    st.integers(min_value=0, max_value=4),     # second-resolution ts (ties!)
    st.integers(min_value=-3, max_value=3)),   # cents-scale values (ties!)
    min_size=2, max_size=14))
def test_mann_kendall_matches_python_textbook(vals):
    """The engine's S, tie-corrected variance, and z equal a direct
    pure-python evaluation of the textbook formulas (Kendall 1975 with
    BOTH tie families and the cross terms) on data dense with value
    AND time ties."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        mann_kendall,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=s), 1, float(v) / 100)
            for i, (s, v) in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = mann_kendall(df, "user_id").first()

    pts = [(s, v) for s, v in vals]   # (time, cents) — engine's c = v
    n = len(pts)
    # strictly time-ordered pairs only: same-timestamp pairs contribute
    # nothing (the tau-b convention the engine implements)
    S = sum((1 if b[1] > a[1] else -1 if b[1] < a[1] else 0)
            for a in pts for b in pts if a[0] < b[0])

    def tie_sums(keys):
        from collections import Counter
        cnt = Counter(keys)
        t1 = sum(t * (t - 1) * (2 * t + 5) for t in cnt.values())
        t2 = sum(t * (t - 1) * (t - 2) for t in cnt.values())
        t3 = sum(t * (t - 1) for t in cnt.values())
        return t1, t2, t3

    T1, T2, T3 = tie_sums([v for _, v in pts])
    U1, U2, U3 = tie_sums([s for s, _ in pts])
    var18 = n * (n - 1) * (2 * n + 5) - T1 - U1
    assert got["s_stat"] == S
    assert got["var18"] == var18
    var = var18 / 18.0
    if n > 2:
        var += (T2 * U2) / (9.0 * n * (n - 1) * (n - 2))
    if n > 1:
        var += (T3 * U3) / (2.0 * n * (n - 1))
    if var > 0:
        import math as m
        z = (S - (1 if S > 0 else -1 if S < 0 else 0)) / m.sqrt(var)
        assert abs(got["z"] - z) < 2e-6
    else:
        assert got["z"] is None


@settings(max_examples=6, deadline=None)
@given(cols=st.lists(st.tuples(
    st.integers(min_value=-5, max_value=5),
    st.integers(min_value=-5, max_value=5)),
    min_size=3, max_size=20))
def test_spearman_matches_python_reference(cols):
    """spearman_matrix equals the average-rank Pearson computed in pure
    python on tie-heavy integer data."""
    import math as m

    from auto_ml_platform_with_timeseries_data_spark.operators.profile import (
        spearman_matrix,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in cols], "x double, y double")
    got = spearman_matrix(df, ["x", "y"]).first()

    def avg_ranks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        r = [0.0] * len(vs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vs[order[j]] == vs[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for t in range(i, j):
                r[order[t]] = avg
            i = j
        return r

    xs = [a for a, _ in cols]
    ys = [b for _, b in cols]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(cols)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx)
    dy = sum((b - my) ** 2 for b in ry)
    if dx == 0 or dy == 0:
        assert got["corr"] is None
    else:
        rho = num / m.sqrt(dx * dy)
        assert abs(got["corr"] - rho) < 2e-6


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.floats(min_value=-1e3, max_value=1e3,
                               allow_nan=False, allow_infinity=False),
                     min_size=4, max_size=18),
       ids=st.lists(st.integers(min_value=0, max_value=2**61),
                    min_size=18, max_size=18, unique=True))
def test_theil_sen_sampled_hash_matches_python(vals, ids):
    """The portable affine-mod pair sampler keeps exactly the pairs
    python says it keeps — including with event ids near 2^61, the
    overflow regime the round-8 both-ids-mod-P fix addressed — and
    the sampled/full medians match a pure-python evaluation."""
    import datetime as dt
    import statistics

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        _TS_SAMPLE_A,
        _TS_SAMPLE_P,
        _TS_SAMPLE_RATE,
        theil_sen_sampled,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(ids[i], t0 + dt.timedelta(seconds=7 * i), 1, float(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = theil_sen_sampled(df, "user_id").first()

    pts = sorted(((ids[i], 7 * i, math.floor(v * 100 + 0.5))
                  for i, v in enumerate(vals)))
    slopes, kept = [], []
    for i, (ia, sa, ca) in enumerate(pts):
        for ib, sb, cb in pts:
            if ia < ib and sa != sb:
                m = (cb - ca) / (sb - sa)
                slopes.append(m)
                if ((ia % _TS_SAMPLE_P) * _TS_SAMPLE_A
                        + (ib % _TS_SAMPLE_P)) \
                        % _TS_SAMPLE_P % _TS_SAMPLE_RATE == 0:
                    kept.append(m)
    assert got["n_pairs"] == len(slopes)
    assert got["n_sampled"] == len(kept)

    def pin(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert got["slope_full"] == pin(statistics.median(slopes))
    if kept:
        assert got["slope_sampled"] == pin(statistics.median(kept))
    else:
        assert got["slope_sampled"] is None


@settings(max_examples=8, deadline=None)
@given(xs=st.lists(st.floats(min_value=-1e4, max_value=1e4,
                             allow_nan=False, allow_infinity=False),
                   min_size=2, max_size=25))
def test_robust_quantiles_match_numpy_with_negatives(xs):
    """Quartiles from the span machinery equal numpy's linear-method
    percentiles on arbitrary (including negative) data."""
    import numpy as np

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(float(v),) for v in xs], "x double")
    got = scaling.robust_quantile_params(df, ["x"]).first()
    for col, q in (("p25", 25), ("p50", 50), ("p75", 75)):
        want = float(np.percentile(xs, q))
        assert abs(got[col] - want) < 2e-6, (col, got[col], want)


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.floats(min_value=-1e3, max_value=1e3,
                               allow_nan=False, allow_infinity=False),
                     min_size=3, max_size=20),
       ids=st.lists(st.integers(min_value=0, max_value=2**61),
                    min_size=20, max_size=20, unique=True),
       cap=st.integers(min_value=2, max_value=8))
def test_theil_sen_capped_selection_matches_python(vals, ids, cap):
    """The hash-rank row cap retains exactly the rows python says it
    retains (portable affine-mod hash, id tie-break) — including ids
    near 2^61 — and the capped median matches a pure-python evaluation
    of the same pair set."""
    import datetime as dt
    import statistics

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        _TS_CAP_SALT,
        _TS_SAMPLE_A,
        _TS_SAMPLE_P,
        theil_sen_capped,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(ids[i], t0 + dt.timedelta(seconds=3 * i), 1, float(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = theil_sen_capped(df, "user_id", cap=cap).first()

    def h(i):
        return ((i % _TS_SAMPLE_P) * _TS_SAMPLE_A
                + _TS_CAP_SALT) % _TS_SAMPLE_P

    pts = [(ids[i], 3 * i, math.floor(v * 100 + 0.5))
           for i, v in enumerate(vals)]
    keep = sorted(pts, key=lambda p: (h(p[0]), p[0]))[:cap]
    slopes = [(cb - ca) / (sb - sa)
              for ia, sa, ca in keep for ib, sb, cb in keep
              if ia < ib and sa != sb]
    assert got["n_events"] == min(cap, len(pts))
    assert got["n_pairs"] == len(slopes)
    if slopes:
        want = math.floor(statistics.median(slopes) * 1e6 + 0.5) / 1e6
        assert got["slope"] == want
    else:
        assert got["slope"] is None


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1)),
                     min_size=2, max_size=40))
def test_mutual_information_matches_python(rows):
    """MI from the melted contingency pass equals the direct
    Σ (c_xy/N)·ln(c_xy·N/(c_x·c_y)) evaluation, and a constant label
    yields exactly zero."""
    from collections import Counter

    from auto_ml_platform_with_timeseries_data_spark.operators.profile import (
        mutual_information,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(rows, "x int, y int")
    got = mutual_information(df, {"x": F.col("x")}, F.col("y")).first()
    n = len(rows)
    cxy = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    mi = sum((c / n) * math.log((c * n) / (cx[x] * cy[y]))
             for (x, y), c in cxy.items())
    want = math.floor(mi * 1e6 + 0.5) / 1e6
    assert got["n_cells"] == len(cxy)
    assert abs(got["mi_nats"] - want) <= 1e-6


@settings(max_examples=6, deadline=None)
@given(edges=st.sets(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                     min_size=1, max_size=22))
def test_coreness_matches_python_peeling(edges):
    """The H-index iteration converges to the classic peeling-defined
    core numbers on arbitrary small graphs."""
    from auto_ml_platform_with_timeseries_data_spark.operators.graph import (
        coreness,
    )

    simple = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not simple:
        return
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(simple, "a long, b long")
    got = {r["vertex"]: r["coreness"]
           for r in coreness(df, rounds=10).collect()}
    adj: dict[int, set[int]] = {}
    for a, b in simple:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    alive = set(adj)
    k = 0
    while alive:
        while True:
            dead = {u for u in alive
                    if sum(1 for v in adj[u] if v in alive) <= k}
            if not dead:
                break
            for u in dead:
                want[u] = k
            alive -= dead
        k += 1
    assert got == want
