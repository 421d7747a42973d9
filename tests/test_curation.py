"""Semantics + plan contracts for the curation operators
(operators/curation.py): deterministic sampling, hash splits, class
balancing, sequence packing, decontamination."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
    _M32,
    balance_groups,
    decontaminate,
    hash_split,
    hash_u32,
    pack_sequences,
    stratified_sample,
)
from auto_ml_platform_with_timeseries_data_spark.plans import explain
from auto_ml_platform_with_timeseries_data_spark.registry import queries


# ---------------------------------------------------------------------------
# Plan contracts (the scale claims in the docstrings, checked)
# ---------------------------------------------------------------------------


def test_sampling_and_split_are_map_only(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    for out in (
        stratified_sample(df, "doc_id", "lang", {"en": 0.5}, 0.2),
        hash_split(df, "doc_id"),
    ):
        plan = explain.formatted_plan(out)
        assert "Exchange" not in plan  # zero shuffles: row-local only


def test_uniform_sample_is_topk_not_full_sort(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q78_uniform_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert ") Sort" not in plan  # no global sort node


def test_decontaminate_broadcasts_bench_side(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q77_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus side never shuffles to join


def test_pack_sequences_single_window_pass(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q76_pack_sequences"](spark, sf_dir))
    assert plan.count(") Window") == 1


# ---------------------------------------------------------------------------
# Operator semantics on tiny frames
# ---------------------------------------------------------------------------


def test_hash_u32_range_and_determinism(spark):
    df = spark.range(5000).select(hash_u32("id").alias("h"))
    lo, hi = df.agg(F.min("h"), F.max("h")).first()
    assert 0 <= lo and hi < _M32
    a = [r["h"] for r in df.collect()]
    b = [r["h"] for r in spark.range(5000).select(
        hash_u32("id").alias("h")).collect()]
    assert a == b


def test_stratified_sample_rates(spark):
    rows = [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(20000)]
    df = spark.createDataFrame(rows)
    kept = stratified_sample(df, "doc_id", "lang", {"en": 0.5}, 0.1)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] / 10000 - 0.5) < 0.05
    assert abs(got["de"] / 10000 - 0.1) < 0.03


def test_hash_split_partitions_and_covers(spark):
    df = spark.range(10000).select(F.col("id").alias("doc_id"))
    out = hash_split(df, "doc_id")
    got = {r["split"]: r["n"] for r in
           out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(got.values()) == 10000
    assert abs(got["train"] / 10000 - 0.8) < 0.05
    assert abs(got["val"] / 10000 - 0.1) < 0.03


def test_balance_groups_caps_and_keeps_small_groups(spark):
    rows = [Row(g="big", doc_id=i) for i in range(100)] + \
           [Row(g="small", doc_id=1000 + i) for i in range(3)]
    df = spark.createDataFrame(rows)
    out = balance_groups(df, ["g"], "doc_id", cap=10)
    got = {r["g"]: r["n"] for r in
           out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got == {"big": 10, "small": 3}
    # deterministic: same 10 ids every run
    a = sorted(r["doc_id"] for r in out.filter("g = 'big'").collect())
    b = sorted(r["doc_id"] for r in
               balance_groups(df, ["g"], "doc_id", 10)
               .filter("g = 'big'").collect())
    assert a == b


def test_pack_sequences_concat_then_chunk(spark):
    # budget 10; token lengths 4,4,4,4 → exclusive prefixes 0,4,8,12
    # → packs 0,0,0,1 (a doc belongs where its FIRST token lands)
    rows = [Row(shard="s", doc_id=i, nt=4) for i in range(4)]
    df = spark.createDataFrame(rows)
    out = pack_sequences(df, "shard", "doc_id", F.col("nt"), budget=10)
    got = [r["pack_id"] for r in out.orderBy("doc_id").collect()]
    assert got == [0, 0, 0, 1]


def test_decontaminate_finds_planted_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon"
    rows = [
        Row(doc_id=0, text=bench_text),                        # benchmark
        Row(doc_id=1, text="x alpha beta gamma delta y"),      # contaminated
        Row(doc_id=2, text="unrelated words only here now"),   # clean
        Row(doc_id=3, text="ALPHA  beta GAMMA delta"),         # case/ws-normalized hit
    ]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["n_shared_grams"] for r in
           decontaminate(df, "doc_id", "text",
                         F.col("doc_id") == 0, n=4).collect()}
    # bench grams: {'alpha beta gamma delta', 'beta gamma delta epsilon'};
    # doc1 and doc3 each share exactly 'alpha beta gamma delta'
    assert out == {1: 1, 3: 1}


def test_fuzzy_decontaminate_planted(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        fuzzy_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about spark engines"),
         (3, "the quick brown fox jumps over a lazy dog today")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in fuzzy_decontaminate(
        corpus, bench, "doc_id", "text", shingle_n=2, threshold=0.3).collect()}
    assert 1 in got and got[1]["max_jaccard"] == 1.0   # exact copy
    assert 3 in got and 0.3 <= got[3]["max_jaccard"] < 1.0  # near copy
    assert 2 not in got                                 # unrelated


def test_chi_square_independence_matches_scipy_formula(spark):
    """Planted 2×2 table with known chi2: [[30,10],[10,30]] →
    chi2 = 80·(30·30−10·10)²/(40·40·40·40) = 20.0, dof 1."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        chi_square_independence,
    )

    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 30)
    df = spark.createDataFrame(rows, "l string, s string")
    r = chi_square_independence(df, "l", "s").first()
    assert r["dof"] == 1 and r["n"] == 80
    assert abs(r["chi2"] - 20.0) < 1e-6


def test_chi_square_independent_table_is_near_zero(spark):
    """Perfectly proportional table → chi2 exactly 0."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        chi_square_independence,
    )

    rows = ([("a", "x")] * 20 + [("a", "y")] * 10
            + [("b", "x")] * 40 + [("b", "y")] * 20)
    df = spark.createDataFrame(rows, "l string, s string")
    r = chi_square_independence(df, "l", "s").first()
    assert r["chi2"] == 0.0


def test_ks_two_sample_planted_shift(spark):
    """Identical samples → ks 0; disjoint ranges → ks 1; a planted
    half-shift → ks 0.5."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        ks_two_sample,
    )

    same = [("a", float(v)) for v in range(50)] + \
           [("b", float(v)) for v in range(50)]
    df = spark.createDataFrame(same, "g string, v double")
    assert ks_two_sample(df, "v", "g", "a", "b").first()["ks"] == 0.0

    disjoint = [("a", float(v)) for v in range(50)] + \
               [("b", float(v + 100)) for v in range(50)]
    df = spark.createDataFrame(disjoint, "g string, v double")
    assert ks_two_sample(df, "v", "g", "a", "b").first()["ks"] == 1.0

    # b = a shifted so half of b's mass sits past a's max
    half = [("a", float(v)) for v in range(40)] + \
           [("b", float(v + 20)) for v in range(40)]
    df = spark.createDataFrame(half, "g string, v double")
    r = ks_two_sample(df, "v", "g", "a", "b").first()
    assert abs(r["ks"] - 0.5) < 1e-6
    assert r["n_a"] == 40 and r["n_b"] == 40


def test_split_leakage_planted(spark):
    """Three duplicate groups: one fully in train, one fully in test,
    one straddling — exactly the straddler is counted."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        split_leakage,
    )

    rows = [
        (1, "aaa", "train"), (2, "aaa", "train"),        # train-only dup
        (3, "bbb", "test"), (4, "bbb", "test"),          # test-only dup
        (5, "ccc", "train"), (6, "ccc", "test"),         # LEAKED
        (7, "ddd", "train"),                              # unique
        (8, "eee", "val"),                                # other split
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    r = split_leakage(df, "text", "split").first()
    assert r["n_groups"] == 4            # aaa, bbb, ccc, ddd (val excluded)
    assert r["n_leaked_groups"] == 1
    assert r["n_docs_in_leaked"] == 2
    assert abs(r["leak_rate"] - 0.25) < 1e-9


def test_chi_square_counts_zero_observed_cells(spark):
    """Diagonal 2×2 table with only (a,x)=10 and (b,y)=10 observed:
    Pearson chi2 must include the two ZERO cells ((0−5)²/5 = 5 each) —
    total 20, not the 10 an observed-cells-only sum reports."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        chi_square_independence,
    )

    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "l string, s string")
    r = chi_square_independence(df, "l", "s").first()
    assert r["chi2"] == 20.0
    assert r["dof"] == 1 and r["n"] == 20


def test_chi_square_null_categories_complete_case(spark):
    """NULL categories are dropped before aggregation (complete-case):
    the planted 2×2 with chi2=20 keeps chi2=20/dof=1/n=80 after NULL
    rows are mixed in, and DuckDB running the q135 oracle's WHERE
    convention on the same rows agrees — the engine and oracle
    implement the SAME population."""
    import duckdb

    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        chi_square_independence,
    )

    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 30
            + [(None, "x")] * 7 + [("a", None)] * 5 + [(None, None)] * 3)
    df = spark.createDataFrame(rows, "l string, s string")
    r = chi_square_independence(df, "l", "s").first()
    assert r["dof"] == 1 and r["n"] == 80
    assert abs(r["chi2"] - 20.0) < 1e-6

    con = duckdb.connect()
    con.execute("CREATE TABLE t (l VARCHAR, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    o = con.execute("""
        WITH c AS (
          SELECT l, s, count(*) AS n FROM t
          WHERE l IS NOT NULL AND s IS NOT NULL GROUP BY 1, 2
        ),
        m AS (
          SELECT n, sum(n) OVER (PARTITION BY l) AS ra,
                 sum(n) OVER (PARTITION BY s) AS cb,
                 sum(n) OVER () AS tot, l, s
          FROM c
        )
        SELECT floor((sum((n - CAST(ra AS DOUBLE) * cb / tot)
                          * (n - CAST(ra AS DOUBLE) * cb / tot)
                          / (CAST(ra AS DOUBLE) * cb / tot))
                      + max(tot)
                      - sum(CAST(ra AS DOUBLE) * cb / tot)) * 1e6 + 0.5)
               / 1e6 AS chi2,
               (count(DISTINCT l) - 1) * (count(DISTINCT s) - 1) AS dof,
               max(tot) AS n
        FROM m
    """).fetchone()
    assert (float(o[0]), int(o[1]), int(o[2])) == \
        (r["chi2"], r["dof"], r["n"])


def test_bloom_decontaminate_no_false_negatives_and_low_fp(spark):
    from pyspark.sql import functions as F

    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        decontaminate_bloom,
    )

    bench_text = "the secret benchmark passage about distributed joins"
    rows = [(0, bench_text)]                      # the benchmark doc
    rows.append((1, "prefix words then " + bench_text + " then suffix"))
    rows += [(i, f"clean document number {i} with unique tokens "
                 f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
             for i in range(2, 202)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = decontaminate_bloom(df, "doc_id", "text",
                              F.col("doc_id") == 0, n=4).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[1]["exact_hit"] is True
    assert all(r["fn_free"] for r in got)          # the Bloom guarantee
    # clean docs share no 4-gram with the benchmark
    fp_capable = [r for r in got if not r["exact_hit"]]
    assert len(fp_capable) == 200


def test_temperature_mix_flattens_head_sources(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        temperature_mix_sample,
    )

    rows = [(i, "head") for i in range(9000)]
    rows += [(i + 9000, "tail") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_mix_sample(df, "doc_id", "source")
    counts = {r["source"]: r["cnt"] for r in
              kept.groupBy("source").agg(F.count("*").alias("cnt"))
              .collect()}
    # natural head share 90%; sqrt-flattened target share = 3/4.
    # tail rate = min(1, .5*10000*sqrt(1000)/(sqrt(9000)+sqrt(1000))/1000)
    # = 1.0 → all 1000 tail docs kept; head keeps ~3750 of 9000.
    assert counts["tail"] == 1000
    assert 3300 < counts["head"] < 4200
    head_share = counts["head"] / (counts["head"] + counts["tail"])
    assert head_share < 0.82          # flattened vs the natural 0.9


# ---------------------------------------------------------------------------
# q163 token-budget head
# ---------------------------------------------------------------------------


def test_token_budget_head_inclusive_cutoff(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        token_budget_head,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["tok"] * (5 + i))) for i in range(40)]
    )
    out = token_budget_head(df, "doc_id", "text", 300).toPandas()
    # independent recomputation: hash order, inclusive running sum
    rows = sorted(
        ((i % 1000003) * 2654435761 % _M32, i, 5 + i) for i in range(40)
    )
    want, acc = [], 0
    for _pri, i, n in rows:
        acc += n
        if acc > 300:
            break
        want.append((i, n, acc))
    got = sorted(zip(out.doc_id, out.n_tokens, out.cum_tokens))
    assert [tuple(map(int, g)) for g in got] == sorted(want)
    assert 0 < len(want) < 40  # the budget actually cut the corpus


def test_token_budget_head_no_global_window(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        token_budget_head,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text="a b c") for i in range(100)])
    plan = explain.formatted_plan(token_budget_head(df, "doc_id", "text", 50))
    # the running sum must execute under a PARTITIONED window — a global
    # single-task cumulative window would print an empty partition spec
    assert "Window" in plan
    assert "windowspecdefinition(cum_tokens" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            spec = line.split("windowspecdefinition(", 1)[1]
            assert spec.split(",")[0].strip().startswith("__pid")


def test_token_budget_head_empty_input(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        token_budget_head,
    )

    df = spark.createDataFrame([], "doc_id long, text string")
    out = token_budget_head(df, "doc_id", "text", 100)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "cum_tokens"]


def test_gopher_flags_planted_rules(spark):
    """Each rule trips on a purpose-built document and the composite
    gate is their conjunction."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        gopher_quality_flags,
    )

    rows = [
        # passes everything: >5 words, sane lengths, stopwords, alpha
        (1, "the quick brown fox is one of the best animals in town", "en"),
        (2, "too short", "en"),                        # fails r_words (<5)
        (3, "# ## ### #### the is of " + "x " * 10, "en"),  # symbol-heavy
        (4, "zz qq ww ee rr tt yy uu ii oo", "en"),    # no stopwords
        (5, "the is of to 12345 67890 11111 22222 33333", "en"),  # digits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in
           gopher_quality_flags(df, "doc_id", "text").collect()}
    assert got[1]["passes"]
    assert not got[2]["r_words"] and not got[2]["passes"]
    assert not got[3]["r_symbol"]
    assert not got[4]["r_stop"]
    assert not got[5]["r_alpha"]     # 5 of 9 words are digit-only


def test_stratified_token_head_cuts_each_stratum(spark):
    """Each stratum is cut at ITS OWN budget boundary, and the result
    is invariant under input partitioning (the two-pass prefix sum
    cannot depend on where range-partition boundaries land)."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        hash_u32,
        stratified_token_budget_head,
    )

    rows = [(i, "w " * ((i % 7) + 1), ["en", "fr", "de"][i % 3])
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    budget = 50

    got = stratified_token_budget_head(df, "doc_id", "text", "lang", budget)
    out = got.collect()

    # brute-force expected set: per-stratum cumulative in (hash, id) order
    import collections
    pri = {r["doc_id"]: ((r["doc_id"] % 1000003) * 2654435761) % 4294967296
           for r in out}  # sanity only; recompute below for all rows
    all_rows = [(i, (i % 7) + 1, ["en", "fr", "de"][i % 3]) for i in range(300)]
    by_lang = collections.defaultdict(list)
    for i, nt, lang in all_rows:
        h = ((i % 1000003) * 2654435761) % 4294967296
        by_lang[lang].append((h, i, nt))
    expected = {}
    for lang, lst in by_lang.items():
        cum = 0
        for h, i, nt in sorted(lst):
            cum += nt
            if cum <= budget:
                expected[i] = (lang, nt, cum)
    assert {r["doc_id"]: (r["lang"], r["n_tokens"], r["cum_tokens"])
            for r in out} == expected

    # partitioning invariance
    got2 = stratified_token_budget_head(
        df.repartition(7, "doc_id"), "doc_id", "text", "lang", budget)
    assert sorted((r["doc_id"], r["cum_tokens"]) for r in got2.collect()) \
        == sorted((r["doc_id"], r["cum_tokens"]) for r in out)


def test_quality_classifier_margin_arithmetic(spark):
    """The raw margin must equal the hand-computed hashing-trick sum
    (unigrams + composed bigram codes); ineligible-only docs score a
    neutral 0.5 with keep=False."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        _FTC_BUCKETS,
        _FTC_KNUTH,
        _FTC_WMOD,
        _FTC_WOFF,
        quality_classifier_score,
    )

    def code(t):
        return sum(ord(ch) * (i + 1) for i, ch in enumerate(t))

    def w(c):
        return ((c % _FTC_BUCKETS) * _FTC_KNUTH) % _FTC_WMOD - _FTC_WOFF

    rows = [(1, "ab  CD! cd"), (2, "-- ÉÉ ??")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           quality_classifier_score(df, "doc_id", "text").collect()}
    # doc 1 eligible tokens after normalize: [ab, cd] ("cd!" fails the
    # ^[a-z0-9]+$ gate); features = 2 unigrams + 1 bigram "ab_cd"
    expect = w(code("ab")) + w(code("cd")) + w(code("ab_cd"))
    assert got[1]["n_feats"] == 3
    assert got[1]["raw_score"] == expect
    assert got[1]["keep"] == (expect > 0)
    assert got[2]["n_feats"] == 0
    assert got[2]["raw_score"] == 0
    assert got[2]["score"] == 0.5
    assert got[2]["keep"] is False


def test_doremi_upweights_hard_domains(spark):
    """A domain of rare bigrams (hard under the corpus LM) must gain
    weight relative to its token share; the easy domain loses it.
    Weights stay normalized (sum within ppm rounding of 1e6)."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        domain_reweight,
    )

    rows = [(i, "common words common words common words", "easy")
            for i in range(10)]
    rows += [(100 + i, f"rare{i}a rare{i}b rare{i}c rare{i}d rare{i}e "
              f"rare{i}f", "hard") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = {r["domain"]: r for r in
           domain_reweight(df, "doc_id", "text", "src").collect()}
    total_tokens = sum(r["tokens"] for r in got.values())
    hard_share = got["hard"]["tokens"] * 1_000_000 // total_tokens
    assert got["hard"]["excess_ppm"] > 0 > got["easy"]["excess_ppm"]
    assert got["hard"]["weight_ppm"] > hard_share
    assert abs(sum(r["weight_ppm"] for r in got.values()) - 1_000_000) <= 2


def test_k_anonymity_flags_small_groups(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        k_anonymity_groups,
    )

    df = spark.createDataFrame(
        [(1, "A")] * 10 + [(2, "B")] * 3, "nat long, seg string")
    got = {(r["nat"], r["seg"]): r for r in
           k_anonymity_groups(df, ["nat", "seg"], k=8).collect()}
    assert got[(1, "A")]["suppress"] == 0
    assert got[(2, "B")]["suppress"] == 1 and got[(2, "B")]["group_count"] == 3


def test_doremi_scoreless_corpus_is_uniform(spark):
    """A corpus where every doc is under 2 tokens has no LM signal
    (gmean 0): the reweight must return zero excess and the plain
    token-share weight rather than raise a division error (ANSI)."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        domain_reweight,
    )

    df = spark.createDataFrame(
        [(1, "", "a"), (2, "x", "a"), (3, "y", "b")],
        "doc_id long, text string, src string")
    rows = {r["domain"]: r for r in
            domain_reweight(df, "doc_id", "text", "src").collect()}
    assert all(r["excess_ppm"] == 0 for r in rows.values())
    assert all(r["factor_ppm"] == 1_000_000 for r in rows.values())
    assert abs(sum(r["weight_ppm"] for r in rows.values()) - 1_000_000) <= 2


def test_dsir_select_prefers_target_like_docs(spark):
    """Planted preference: raw docs sharing the target domain's
    distinctive vocabulary outrank generic docs; empty target sample
    degrades to the smoothed floor without crashing."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        dsir_select,
    )

    rows = []
    for i in range(10):   # the target sample (is_target docs)
        rows.append((i, "quantum flux capacitor lattice", "tgt"))
    for i in range(10, 30):  # raw docs that LOOK like the target
        rows.append((i, "quantum lattice flux theory", "raw"))
    for i in range(30, 60):  # generic raw docs
        rows.append((i, "the cat sat on the mat today", "raw"))
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = dsir_select(df, "doc_id", "text", F.col("src") == "tgt",
                      top_n=20).collect()
    top_ids = [r["doc_id"] for r in got]
    # the 20 best must be drawn from the target-like block (10-29);
    # the target docs themselves score highest but are part of the
    # ranking too — assert no generic doc makes the cut
    assert all(i < 30 for i in top_ids)
    assert all(r["dsir_weight"] is not None for r in got)

    empty = dsir_select(df, "doc_id", "text", F.lit(False), top_n=5)
    vals = empty.collect()
    assert len(vals) == 5  # no crash, smoothed floor everywhere



def test_negative_samples_deterministic_excludes_positives(spark):
    """Fixed anchors×k shape; no negative is the anchor itself or one
    of its known positives; the draw is identical across runs and
    partitionings; and a bucket emptied by exclusions reports
    NULL-by-contract."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        negative_samples,
    )

    corpus = spark.createDataFrame([(i,) for i in range(40)],
                                   "item long")
    anchors = spark.createDataFrame([(a,) for a in range(5)],
                                    "qid long")
    positives = spark.createDataFrame(
        [(a, (a + 1) % 40) for a in range(5)], "qid long, item long")

    out = negative_samples(anchors, corpus, positives, "qid", "item",
                           k=4, nbuckets=8)
    rows = out.collect()
    assert len(rows) == 5 * 4
    posset = {(a, (a + 1) % 40) for a in range(5)}
    for r in rows:
        if r["neg_id"] is not None:
            assert r["neg_id"] != r["qid"]
            assert (r["qid"], r["neg_id"]) not in posset
    # deterministic across partitionings
    again = negative_samples(anchors.repartition(7), corpus.repartition(5),
                             positives, "qid", "item",
                             k=4, nbuckets=8).collect()
    key = lambda r: (r["qid"], r["slot"])  # noqa: E731
    assert sorted(map(tuple, rows), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, again), key=lambda t: (t[0], t[1]))
    # a corpus whose every item is a positive of the anchor -> NULLs
    tiny = spark.createDataFrame([(100,)], "item long")
    allpos = spark.createDataFrame([(0, 100)], "qid long, item long")
    one = negative_samples(
        spark.createDataFrame([(0,)], "qid long"), tiny, allpos,
        "qid", "item", k=2, nbuckets=2).collect()
    assert len(one) == 2 and all(r["neg_id"] is None for r in one)
