"""Distributed BPE merge learning (q147/q148) pinned against a
pure-Python reference implementation of Sennrich-style BPE over a
word-frequency table."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.text import (
    _apply_merge,
    bpe_learn,
)


def _py_bpe(word_counts: dict[str, int], num_merges: int,
            min_count: int = 2):
    """Reference BPE: weighted pair counts, argmax with (count desc,
    left, right) tie-break, leftmost-nonoverlapping merge."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((rank, l, r, c, l + r))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def test_bpe_learn_matches_python_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newer newer newer newer",
        "newest newest newest widest widest",
        "low lower newest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    counts: Counter = Counter()
    for t in texts:
        counts.update(t.split())
    want = _py_bpe(dict(counts), num_merges=8)
    got = [(r["rank"], r["left"], r["right"], r["pair_count"],
            r["new_symbol"])
           for r in bpe_learn(df, "text", num_merges=8).orderBy("rank").collect()]
    assert got == want


def test_bpe_merge_fold_semantics(spark):
    """Leftmost-nonoverlapping: 'a a a' under (a,a) → [aa, a]; the merged
    symbol can chain only when it equals the left element itself."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "b"],), (["x", "a", "a", "a", "a"],)],
        "syms array<string>")
    got = [r[0] for r in
           df.select(_apply_merge(F.col("syms"), "a", "a")).collect()]
    assert got == [["aa", "a"], ["a", "b", "b"], ["x", "aa", "aa"]]


def test_bpe_learn_min_count_stops_early(spark):
    df = spark.createDataFrame([(0, "ab"), (1, "cd")],
                               "doc_id long, text string")
    out = bpe_learn(df, "text", num_merges=5, min_count=2).collect()
    assert out == []  # every pair occurs once → below min_count
