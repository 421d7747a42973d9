"""Text-analysis operator tests."""

from __future__ import annotations

import math

from auto_ml_platform_with_timeseries_data_spark.operators import text as tx


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "Data  Table   ROW column data "),
        (3, "join merge sort hash join merge"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(spark):
    got = {r["doc_id"]: r for r in
           tx.token_stats(_docs(spark), "doc_id", "text").collect()}
    assert got[1]["n_tokens"] == 6
    assert got[1]["n_distinct_tokens"] == 5  # 'the' twice
    assert math.isclose(got[1]["avg_token_len"], 17 / 6, abs_tol=1e-6)
    assert got[2]["n_tokens"] == 5  # whitespace collapsed by normalize


def test_quality_score_components(spark):
    got = {r["doc_id"]: r for r in
           tx.quality_score(_docs(spark), "doc_id", "text").collect()}
    assert math.isclose(got[1]["stopword_ratio"], 2 / 6, abs_tol=1e-6)
    assert 0.0 <= got[1]["quality"] <= 1.0


def test_language_id_profiles(spark):
    got = {r["doc_id"]: r["predicted_lang"] for r in
           tx.language_id(_docs(spark), "doc_id", "text").collect()}
    assert got[1] == "en"   # 'the', 'a' markers
    assert got[2] == "es"   # data/table/row/column markers
    assert got[3] == "de"   # join/merge/sort/hash markers


def test_language_id_tie_breaks_alphabetically(spark):
    df = spark.createDataFrame([(1, "zzz qqq")], "doc_id long, text string")
    got = tx.language_id(df, "doc_id", "text").collect()[0]
    assert got["score"] == 0.0
    assert got["predicted_lang"] == "de"  # first alphabetically on all-zero


def test_winnow_fingerprint_guarantee(spark):
    """Winnowing guarantee: two documents sharing a token run of length
    ≥ w+k−1 (here 6) share at least one fingerprint; disjoint-vocabulary
    docs share none."""
    shared = "alpha beta gamma delta epsilon zeta"          # 6 tokens
    rows = [
        (1, f"intro words here {shared} trailing bits"),
        (2, f"{shared} completely other suffix tokens now"),
        (3, "unrelated vocabulary nothing matches at all here ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        winnow_fingerprints,
    )
    fps = winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnow_density(spark):
    """Selected fingerprints ≤ number of windows and ≥ 1 per document."""
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40)))], "doc_id long, text string")
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        winnow_fingerprints,
    )
    n = winnow_fingerprints(df, "doc_id", "text", k=3, w=4).count()
    assert 1 <= n <= 40 - 3 + 1 - 4 + 1


def test_bm25_semantics(spark):
    import math

    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [(1, "data data model"), (2, "other words here"),
         (3, "data only")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           bm25_scores(docs, "doc_id", "text", ["data", "model"]).collect()}
    assert 2 not in got                       # no query term → no row
    # doc 1: tf(data)=2, tf(model)=1, dl=3; doc 3: tf(data)=1, dl=2
    n, avgdl, k1, b = 3, 8 / 3, 1.2, 0.75
    def s(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert got[1] == round(s(2, 2, 3) + s(1, 1, 3), 4)
    assert got[3] == round(s(1, 2, 2), 4)


def test_span_duplication_planted(spark):
    """Two docs share a 10-token boilerplate span; a third is unique —
    exactly the shared spans count as duplicated."""
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        span_duplication,
    )

    boiler = " ".join(f"b{i}" for i in range(10))
    uniq1 = " ".join(f"u{i}" for i in range(10))
    uniq2 = " ".join(f"v{i}" for i in range(10))
    uniq3 = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, "g", boiler + " " + uniq1),   # spans: boiler, uniq1
        (2, "g", boiler + " " + uniq2),   # spans: boiler, uniq2
        (3, "g", uniq3),                  # span: uniq3
        (4, "h", "short text"),           # < 10 tokens → no spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["group"]: r for r in
           span_duplication(df, "doc_id", "text", "lang").collect()}
    g = out["g"]
    assert g["n_spans"] == 5
    assert g["n_dup_spans"] == 2          # the two boiler occurrences
    assert abs(g["dup_rate"] - 0.4) < 1e-9
    assert "h" not in out                 # no spans → no row


def test_unigram_logprob_ranks_rare_token_soup_lowest(spark):
    """A doc of hapax tokens must score below a doc of corpus-common
    tokens; scores are exact unigram log-means."""
    import math

    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        unigram_logprob,
    )

    rows = [(1, "common common common common"),
            (2, "common common rare1 rare2")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["logprob"] for r in
           unigram_logprob(df, "doc_id", "text", top_n=10).collect()}
    # corpus: common×6, rare1×1, rare2×1, N=8
    lp1 = math.log(6 / 8)
    lp2 = (2 * math.log(6 / 8) + 2 * math.log(1 / 8)) / 4
    assert abs(out[1] - (math.floor(lp1 * 1e6 + 0.5) / 1e6)) < 1e-9
    assert abs(out[2] - (math.floor(lp2 * 1e6 + 0.5) / 1e6)) < 1e-9
    assert out[2] < out[1]


def test_bpe_encode_fold_matches_python_reference(spark):
    """The HOF merge fold applied per word equals a pure-Python BPE
    apply on adversarial words (chained merges, repeated symbols,
    merge-at-boundary)."""
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        _ENC_MERGES,
        bpe_encode_counts,
    )

    def py_apply(word):
        syms = list(word)
        for l, r in _ENC_MERGES:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            syms = out
        return len(syms)

    texts = ["the thin anthem on and on", "ththe inin nanan", "t h e",
             "onion anon tintin", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in
           bpe_encode_counts(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        expect = sum(py_apply(w) for w in t.split())
        assert got[i] == expect, (t, got[i], expect)


def test_exact_substring_rewrite_collapses_boilerplate(spark):
    """A doc made entirely of the corpus-repeated span keeps only its
    first occurrence; later docs of the same boilerplate lose ALL full
    spans (tails under one span length always survive)."""
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        exact_substring_rewrite,
    )

    phrase = "a b c d e f g h i j"          # exactly one 10-token span
    rows = [
        (0, " ".join([phrase] * 3)),        # 3 identical spans, no tail
        (1, " ".join([phrase] * 2) + " x y z"),  # all spans are dups
        (2, "p q r s t u v w x0 y0 unique tail here"),  # 1 fresh span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           exact_substring_rewrite(df, "doc_id", "text").collect()}
    # doc 0: spans 1,2 are dups of span 0 -> 20 tokens removed
    assert got[0]["n_tokens"] == 30
    assert got[0]["tokens_removed"] == 20
    assert got[0]["text_kept"] == phrase
    # doc 1: both spans lose to doc 0's span 0; only the tail survives
    assert got[1]["tokens_removed"] == 20
    assert got[1]["text_kept"] == "x y z"
    # doc 2: its single span is globally unique -> untouched
    assert got[2]["tokens_removed"] == 0
    assert got[2]["text_kept"] == "p q r s t u v w x0 y0 unique tail here"


def test_bigram_logprob_hand_computed(spark):
    """Add-one-smoothed bigram LM over a 3-doc corpus, checked against
    hand-computed counts; a repeated phrase scores higher than word
    salad built from the same vocabulary."""
    import math

    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        bigram_logprob,
    )

    rows = [(0, "a b c"), (1, "a b c"), (2, "c a"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bigram_logprob(df, "doc_id", "text").collect()}
    # counts: c(a)=3 c(b)=2 c(c)=3 c(x)=1, V=4
    # bigrams: (a,b)x2 (b,c)x2 (c,a)x1
    lp_ab = math.log((2 + 1) / (3 + 4))
    lp_bc = math.log((2 + 1) / (2 + 4))
    lp_ca = math.log((1 + 1) / (3 + 4))
    exp0 = math.floor((lp_ab + lp_bc) / 2 * 1e6 + 0.5) / 1e6
    exp2 = math.floor(lp_ca * 1e6 + 0.5) / 1e6
    assert got[0]["n_bigrams"] == 2 and got[0]["avg_logprob"] == exp0
    assert got[1]["avg_logprob"] == exp0
    assert got[2]["n_bigrams"] == 1 and got[2]["avg_logprob"] == exp2
    # single-token doc: no bigrams, neutral 0.0
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_logprob"] == 0.0
    # the twice-seen phrase outscores the once-seen transition
    assert got[0]["avg_logprob"] > got[2]["avg_logprob"]


def test_html_extract_strips_blocks_and_decodes_entities(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        html_extract_text,
    )

    df = spark.createDataFrame(
        [(1, "<html><head><title>T</title><script>if (a<b) x()</script>"
             "</head><body><nav>menu</nav><p>Tom &amp; Jerry</p>"
             "<aside>ad</aside><footer>f</footer></body></html>"),
         (2, "plain text no markup")],
        "doc_id long, html string")
    got = {r["doc_id"]: r["extracted"]
           for r in html_extract_text(df, "doc_id", "html").collect()}
    assert got[1] == "tom & jerry"       # boilerplate gone, entity decoded
    assert got[2] == "plain text no markup"


def test_url_normalize_canonical_key(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        normalize_urls,
    )

    df = spark.createDataFrame(
        [(1, "HTTP://WWW.Site.COM:80//a//b/?utm_source=x&id=7#frag"),
         (2, "http://site.com/a/b/?id=7")],
        "doc_id long, url string")
    got = {r["doc_id"]: r for r in
           normalize_urls(df, "doc_id", "url").collect()}
    assert got[1]["norm_url"] == "http://site.com/a/b/?id=7"
    assert got[1]["norm_url"] == got[2]["norm_url"]   # same canonical key
    assert got[1]["host"] == "site.com"


def test_quality_score_empty_doc_is_zero_alpha(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        quality_score,
    )

    df = spark.createDataFrame([(1, ""), (2, "the cat")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            quality_score(df, "doc_id", "text").collect()}
    assert rows[1]["alpha_ratio"] == 0.0      # no ANSI divide error
    assert rows[2]["alpha_ratio"] > 0.5
