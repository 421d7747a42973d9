"""Portable exact twins (q141-q144): the hash-family queries' signature
and candidate machinery re-run through cross-engine-reproducible
quantizers, pinned here against pure-Python references so the driver's
DuckDB agreement can't mask a both-sides-wrong bug."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import dedup, similarity as sim

P = 1_000_000_007


def _poly(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the dog"),
        (2, "Completely   Different TEXT here"),
        (3, "one-token"),          # 1 token → no bigrams → dropped by q141
        (4, None),                 # NULL text → dropped everywhere
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_portable_matches_python_reference(spark):
    got = {r["doc_id"]: r for r in
           dedup.minhash_signatures_portable(_docs(spark), "doc_id", "text",
                                             num_hashes=4).collect()}
    # doc 3 (one token) and doc 4 (NULL) must be absent
    assert set(got) == {0, 1, 2}
    for did, text in ((0, "the quick brown fox jumps over the lazy dog"),
                      (2, "completely different text here")):
        toks = text.lower().split()
        grams = sorted({f"{a} {b}" for a, b in zip(toks, toks[1:])})
        hs = [_poly(g) for g in grams]
        for i in range(4):
            want = min(((2 * i + 1) * h + 7919 * i) % P for h in hs)
            assert got[did][f"sig_{i}"] == want, (did, i)


def test_simhash_portable_matches_python_reference(spark):
    got = {r["doc_id"]: r["simhash"] for r in
           dedup.simhash_portable(_docs(spark), "doc_id", "text").collect()}
    assert 4 not in got  # NULL text: no tokens, no row
    for did, text in ((0, "the quick brown fox jumps over the lazy dog"),
                      (3, "one-token")):
        toks = text.lower().split()
        sig = 0
        for b in range(16):
            vote = sum(1 if (_poly(t) >> b) & 1 else -1 for t in toks)
            if vote > 0:
                sig |= 1 << b
        assert got[did] == sig, did


def _emb_df(spark, n=80, dim=8, seed=11):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            vecs)


def test_signbucket_candidates_and_cosines_exact(spark):
    """q143's candidate rule is fully deterministic: neighbor is a
    candidate iff its sign-bucket is within Hamming distance 1 of the
    query's (on the first 6 dims). The top-k over that pool must match
    a numpy replay exactly, including the rescored cosines."""
    df, vecs = _emb_df(spark)
    queries = df.filter(df.vec_id < 4)
    got = sim.cosine_topk_signbucket(df, queries, "vec_id", "embedding", k=3)
    buckets = ((vecs[:, :6] > 0).astype(int) * (1 << np.arange(6))).sum(axis=1)
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    got_rows = got.collect()
    by_q: dict[int, list] = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    for q in range(4):
        probe = {buckets[q]} | {buckets[q] ^ (1 << d) for d in range(6)}
        cand = [j for j in range(len(vecs))
                if j != q and buckets[j] in probe]
        order = sorted(cand, key=lambda j: (-cos[q, j], j))[:3]
        assert [r["neighbor_id"] for r in by_q.get(q, [])] == order, q
        for r in by_q.get(q, []):
            assert abs(r["cosine"] - round(float(cos[q, r["neighbor_id"]]), 6)) < 1e-9


def test_ivf_fixed_codebook_assignment(spark):
    """Injected-codebook IVF: every returned neighbor's argmax cell must
    lie in the query's probed top-nprobe cells (numpy replay of the
    portable rule), and cosines are exact."""
    df, vecs = _emb_df(spark, n=60)
    queries = df.filter(df.vec_id < 3)
    cents = vecs[10:14]
    got = sim.cosine_topk_ivf(df, queries, "vec_id", "embedding", k=3,
                              ncells=4, nprobe=2, centroids=cents)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    scores = unit @ cn.T
    assign = np.argmax(scores, axis=1)
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    for r in got.collect():
        qid, nid = r["query_id"], r["neighbor_id"]
        probed = set(np.argsort(-scores[qid])[:2])
        assert assign[nid] in probed, (qid, nid)
        assert abs(r["cosine"] - round(float(cos[qid, nid]), 6)) < 1e-9


def test_ann_paths_empty_corpus_schema_stable(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    for out in (
        sim.cosine_topk_srp(empty, empty, "vec_id", "embedding"),
        sim.cosine_topk_ivf(empty, empty, "vec_id", "embedding"),
        sim.embedding_neardup_pairs_lsh(empty, "vec_id", "embedding"),
    ):
        assert out.count() == 0
        assert len(out.schema.fields) in (3, 4)
