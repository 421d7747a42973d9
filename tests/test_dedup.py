"""Dedup tier tests with planted duplicates/near-duplicates."""

from __future__ import annotations

from auto_ml_platform_with_timeseries_data_spark.operators import dedup


def _docs(spark):
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill every day")
    near = base.replace("warm", "cold")          # 1-word change → near-dup
    far = ("completely different content about spark shuffles partitions "
           "and columnar parquet readers with adaptive execution enabled")
    rows = [
        (1, base), (2, "  " + base.upper() + "  "),  # exact after normalize
        (3, near), (4, far), (5, base),               # 5 = byte-identical dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_normalized(spark):
    got = {r["doc_id"]: r for r in
           dedup.exact_dedup_groups(_docs(spark), "doc_id", "text").collect()}
    # 1, 2 (case/space), 5 → one group with canonical 1
    assert got[1]["canonical_id"] == 1 and got[1]["group_size"] == 3
    assert got[2]["canonical_id"] == 1
    assert got[5]["canonical_id"] == 1
    assert got[3]["group_size"] == 1
    assert got[4]["group_size"] == 1


def test_deduplicate_exact_keeps_one_per_group(spark):
    out = dedup.deduplicate_exact(_docs(spark), "text")
    assert out.count() == 3  # {base-group, near, far}


def test_minhash_finds_planted_near_dup(spark):
    pairs = dedup.minhash_dedup_pairs(
        _docs(spark), "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # near-dup 1↔3 must surface; exact dups 1↔2, 1↔5, 2↔5 trivially match
    assert (1, 3) in got or (1, 2) in got  # LSH is probabilistic but these
    assert (1, 5) in got                    # are identical/1-word-off
    assert all(4 not in p for p in got)     # far doc never pairs


def test_simhash_identical_docs_same_signature(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in
            dedup.simhash64(_docs(spark), "doc_id", "text").collect()}
    assert sigs[1] == sigs[2] == sigs[5]
    assert sigs[1] != sigs[4]


def test_simhash_near_pairs_hamming(spark):
    pairs = dedup.simhash_near_pairs(
        _docs(spark), "doc_id", "text", max_hamming=6
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0 and got.get((1, 5)) == 0
    assert (1, 4) not in got


def test_jaccard_pairs_blocked(spark):
    from pyspark.sql import functions as F

    df = _docs(spark).withColumn("lang", F.lit("en"))
    pairs = dedup.jaccard_pairs_blocked(df, "doc_id", "text", "lang",
                                        shingle_n=2, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0 and got[(1, 5)] == 1.0
    assert 0.5 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_jaccard_strategies_agree(spark):
    """index (inverted-index count) and prefix (AllPairs/PPJoin) are two
    physical plans for one logical contract — identical output, at every
    threshold, including low thresholds where prefixes are short."""
    from pyspark.sql import functions as F

    df = _docs(spark).withColumn("lang", F.lit("en"))
    for t in (0.2, 0.5, 0.8):
        out = {
            s: sorted(
                map(tuple, dedup.jaccard_pairs_blocked(
                    df, "doc_id", "text", "lang", shingle_n=2, threshold=t,
                    strategy=s).collect())
            )
            for s in ("index", "prefix", "auto")
        }
        assert out["index"] == out["prefix"] == out["auto"], t


def test_connected_components_chain_and_singletons(spark):
    """A 4-node chain collapses to min-id 1 in O(diameter) rounds;
    isolated nodes keep their own id as component."""
    vertices = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in
           dedup.connected_components(vertices, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6}


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short doc quoted inside a long one: containment ≈ 1 while
    Jaccard is small — the asymmetric dedup case q18 cannot flag."""
    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        containment_pairs_blocked,
        jaccard_pairs_blocked,
    )

    short = " ".join(f"q{i}" for i in range(8))          # 7 bigrams
    long = short + " " + " ".join(f"x{i}" for i in range(40))
    rows = [(1, "en", short), (2, "en", long), (3, "en", "other words only")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    cont = containment_pairs_blocked(df, "doc_id", "text", "lang",
                                     threshold=0.5).collect()
    assert len(cont) == 1
    assert (cont[0]["id_a"], cont[0]["id_b"]) == (1, 2)
    assert cont[0]["containment"] == 1.0                  # fully contained

    jac = jaccard_pairs_blocked(df, "doc_id", "text", "lang",
                                threshold=0.5).collect()
    assert jac == []                                      # Jaccard misses it


def test_incremental_dedup_status_classes(spark):
    corpus = spark.createDataFrame(
        [(10, "alpha bravo charlie"), (11, "delta echo foxtrot")],
        "doc_id long, text string")
    delta = spark.createDataFrame(
        [(20, "  ALPHA   bravo charlie "),   # dup of corpus doc 10
         (21, "golf hotel india"),           # novel, owns its fp
         (22, "golf hotel india"),           # dup within the delta
         (23, "juliet kilo lima")],          # novel
        "doc_id long, text string")
    idx = dedup.fingerprint_index(corpus, "doc_id", "text")
    got = {r["doc_id"]: r for r in
           dedup.incremental_dedup_status(delta, idx, "doc_id", "text")
           .collect()}
    assert (got[20]["status"], got[20]["canonical_id"]) == ("dup_corpus", 10)
    assert (got[21]["status"], got[21]["canonical_id"]) == ("novel", 21)
    assert (got[22]["status"], got[22]["canonical_id"]) == ("dup_delta", 21)
    assert (got[23]["status"], got[23]["canonical_id"]) == ("novel", 23)


def test_incremental_neardup_finds_cross_batch_pair(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base.replace("kappa", "KAPPA2")       # high-J near-dup
    corpus = spark.createDataFrame(
        [(1, base), (2, "totally different text about parquet footers "
                        "and shuffle partitions in adaptive execution")],
        "doc_id long, text string")
    delta = spark.createDataFrame(
        [(10, near), (11, "unrelated fresh content nobody saw before "
                          "with its own vocabulary entirely")],
        "doc_id long, text string")
    got = dedup.incremental_neardup_pairs(delta, corpus, "doc_id", "text",
                                          threshold=0.3,
                                          broadcast_delta=True).collect()
    pairs = {(r["delta_id"], r["corpus_id"]) for r in got}
    assert (10, 1) in pairs
    assert all(d != 11 for d, _ in pairs)
    # the default shuffle-join plan (broadcast_delta=False) is the
    # same verify over the same candidates — identical output to the
    # opt-in broadcast plan, jaccard values included
    fb = dedup.incremental_neardup_pairs(
        delta, corpus, "doc_id", "text", threshold=0.3).collect()
    assert {(r["delta_id"], r["corpus_id"], r["jaccard"]) for r in fb} \
        == {(r["delta_id"], r["corpus_id"], r["jaccard"]) for r in got}


def test_index_update_two_batch_sequence(spark):
    """The daily loop: batch 1's NOVEL docs enter the index via
    update_fingerprint_index, so batch 2 copies of them classify as
    dup_corpus pointing at batch 1's canonical — and a fingerprint
    already indexed keeps its ORIGINAL canonical (dedup-on-merge)."""
    from auto_ml_platform_with_timeseries_data_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], "doc_id long, text string")
    idx0 = dedup.fingerprint_index(corpus, "doc_id", "text")

    # batch 1: one novel doc (10) + one copy of corpus doc 1 (11)
    b1 = spark.createDataFrame(
        [(10, "gamma text"), (11, "alpha text")], "doc_id long, text string")
    idx1 = dedup.update_fingerprint_index(idx0, b1, "doc_id", "text")
    got1 = {r["fingerprint"]: r["canonical_id"] for r in idx1.collect()}
    assert len(got1) == 3                       # alpha, beta, gamma
    assert 10 in got1.values()                  # gamma canonicalized to 10
    assert 11 not in got1.values()              # alpha keeps canonical 1

    # batch 2: a copy of batch 1's novel doc under a new id
    b2 = spark.createDataFrame(
        [(20, "gamma text"), (21, "delta text")], "doc_id long, text string")
    st = {r["doc_id"]: (r["status"], r["canonical_id"])
          for r in dedup.incremental_dedup_status(
              b2, idx1, "doc_id", "text").collect()}
    assert st[20] == ("dup_corpus", 10)         # sees batch 1's novel
    assert st[21] == ("novel", 21)

    # rolling the index again is idempotent for already-indexed fps
    idx2 = dedup.update_fingerprint_index(idx1, b2, "doc_id", "text")
    got2 = {r["fingerprint"]: r["canonical_id"] for r in idx2.collect()}
    assert len(got2) == 4
    assert set(got1.items()) <= set(got2.items())


def test_select_canonical_keeps_best_not_first(spark):
    """The cluster survivor is the QUALITY argmax (ties to min id), not
    the min id the clustering uses as its component label."""
    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        select_canonical,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (7, 99)],
        "doc_id long, n_chars long")
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)], "doc_id long, component long")
    got = {r["doc_id"]: r for r in
           select_canonical(docs, comp, "doc_id", "n_chars").collect()}
    # cluster 1: docs 2 and 3 tie on quality 50 > doc 1's 10 → doc 2 wins
    assert got[1]["canonical_id"] == 2 and not got[1]["is_canonical"]
    assert got[2]["is_canonical"] and got[3]["canonical_id"] == 2
    assert got[7]["is_canonical"]          # singleton survives


def test_split_by_content_group_never_straddles(spark):
    """Exact duplicates land in the same split by construction, and the
    split of a dup equals the split of its family's min-id member."""
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        hash_split,
    )
    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        normalize_text,  # noqa: F401  (module import sanity)
    )
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        split_by_content_group,
    )

    rows = [(i, f"unique text {i}") for i in range(50)]
    rows += [(1000 + i, f"unique text {i}") for i in range(50)]   # dups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_by_content_group(df, "doc_id", "text")
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    for i in range(50):
        assert got[i] == got[1000 + i]     # family never straddles
    # the family split equals hash_split of the canonical (min) id
    base = {r["doc_id"]: r["split"] for r in
            hash_split(df.filter("doc_id < 50"), "doc_id").collect()}
    for i in range(50):
        assert got[i] == base[i]


def test_hamming_band_pairs_exact_recall(spark):
    """Pigeonhole recall: with 4 bands over 64 bits, EVERY pair within
    distance <= 3 must be found; pairs beyond max_hamming must not."""
    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        hamming_band_pairs,
    )

    base = 0x0123456789ABCDEF
    rows = [
        (1, base & 0xFFFFFFFF, base >> 32),
        (2, (base ^ 0b11) & 0xFFFFFFFF, base >> 32),          # d=2 in lo
        (3, base & 0xFFFFFFFF, (base >> 32) ^ (1 << 31)),     # d=1 in hi
        (4, (base ^ 0xFF) & 0xFFFFFFFF, base >> 32),          # d=8: too far
        (5, base & 0xFFFFFFFF, base >> 32),                   # d=0 dup of 1
    ]
    df = spark.createDataFrame(rows, "id long, lo long, hi long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in hamming_band_pairs(
               df, "id", [("lo", 32), ("hi", 32)], max_hamming=3).collect()}
    assert got[(1, 5)] == 0
    assert got[(1, 2)] == 2 and got[(2, 5)] == 2
    assert got[(1, 3)] == 1 and got[(3, 5)] == 1
    assert got[(2, 3)] == 3
    assert not any(4 in p for p in got)


def test_hamming_band_pairs_delta_recall_is_exact(spark):
    """Pigeonhole recall for the delta-vs-corpus band join: every pair
    within max_hamming ≤ bands−1 is found (checked against the brute
    force), and nothing outside the bound is emitted."""
    import itertools
    import random

    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        hamming_band_pairs_delta,
    )

    rnd = random.Random(9)
    base = [rnd.getrandbits(63) for _ in range(12)]
    corpus = [(i, v & 0xFFFFFFFF, v >> 32) for i, v in enumerate(base)]
    delta = []
    for i, v in enumerate(base):
        flips = rnd.sample(range(64), rnd.choice([0, 1, 2, 3, 5]))
        w = v
        for b in flips:
            w ^= 1 << b
        delta.append((100 + i, w & 0xFFFFFFFF, w >> 32))
    cdf = spark.createDataFrame(
        corpus, "media_id long, dhash_lo long, dhash_hi long")
    ddf = spark.createDataFrame(
        delta, "media_id long, dhash_lo long, dhash_hi long")
    got = {(r["delta_id"], r["corpus_id"]): r["hamming"]
           for r in hamming_band_pairs_delta(
               ddf, cdf, "media_id",
               [("dhash_lo", 32), ("dhash_hi", 32)], 3).collect()}
    want = {}
    for (di, dl, dh), (ci, cl, ch) in itertools.product(delta, corpus):
        hamming = bin((dl ^ cl) | ((dh ^ ch) << 32)).count("1")
        if hamming <= 3:
            want[(di, ci)] = hamming
    assert got == want and len(want) > 0
