"""Behavior locks for the round-2 review fixes: LSH-bucketed embedding
near-dup precision/recall vs the all-pairs baseline, the n-gram
document-frequency cut, as-of join tie-break determinism, IVF centroid
clamping, and MinHash band-divisibility validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_showcase_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from etl_showcase_spark.operators.relational import asof_join
from etl_showcase_spark.operators.similarity import (
    lsh_neardup_pairs,
    neardup_pairs_by_cosine,
)

from .conftest import SF_SMOKE


def test_lsh_neardup_is_exact_subset_of_allpairs(spark):
    from etl_showcase_spark.catalog import table

    e = table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in neardup_pairs_by_cosine(e, "vec_id", "embedding", 0.35).collect()
    }
    bucketed = lsh_neardup_pairs(
        e, "vec_id", "embedding", threshold=0.35, n_planes=6, dim=64, n_tables=8
    ).collect()
    # precision 1: every bucketed pair is a true pair with the identical
    # exact cosine (the verify step is the same integer arithmetic)
    for r in bucketed:
        assert (r.id_a, r.id_b) in exact
        assert abs(r.cosine - exact[(r.id_a, r.id_b)]) < 1e-12
    # OR-amplified recall at a LOW threshold (0.35 → p≈0.61/plane) is
    # modest by design; it must still find a non-trivial share
    if exact:
        recall = len(bucketed) / len(exact)
        assert recall >= 0.15, f"LSH near-dup recall collapsed: {recall}"
    # determinism: a second run returns the identical pair set
    again = lsh_neardup_pairs(
        e, "vec_id", "embedding", threshold=0.35, n_planes=6, dim=64, n_tables=8
    ).collect()
    assert {(r.id_a, r.id_b) for r in again} == {(r.id_a, r.id_b) for r in bucketed}


def test_ngram_df_cut_drops_hot_shingle_pairs(spark):
    # 12 docs all share one viral boilerplate sentence; only two share
    # additional discriminative content
    boiler = "the quick brown fox jumps over the lazy dog again"
    extra = "completely unique discriminative content marker"
    rows = [(i, boiler) for i in range(10)]
    rows += [(10, boiler + " " + extra), (11, boiler + " " + extra)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    no_cut = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, df_max=None
        ).collect()
    }
    cut = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, df_max=12
        ).collect()
    }
    # without the cut every boilerplate pair qualifies (quadratic blowup)
    assert (0, 1) in no_cut and len(no_cut) >= 66
    # the cut removes shingles present in >= 12 of the 12 docs — i.e.
    # the boilerplate — leaving only the discriminative pair
    assert cut == {(10, 11)}


def test_asof_join_tiebreak_is_deterministic_and_row_consistent(spark):
    # two right rows share (key, ts) with CONFLICTING value pairs; the
    # carried (price, qty) must come from ONE row — the struct-max one —
    # regardless of partitioning
    left = spark.createDataFrame([("k", 10)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 5, 100, 1), ("k", 5, 50, 2)], ["key", "ts", "price", "qty"]
    )
    for parts in (1, 7):
        out = asof_join(
            left.repartition(parts),
            right.repartition(parts),
            ["key"],
            "ts",
            "ts",
            ["price", "qty"],
        ).collect()
        assert len(out) == 1
        r = out[0]
        # struct order: (price=100, qty=1) > (price=50, qty=2) → the
        # 100/1 row wins as one unit (never 100/2 or 50/1)
        assert (r.price_asof, r.qty_asof) == (100, 1)


def test_ivf_clamps_centroids_to_corpus_size(spark):
    from etl_showcase_spark.operators.similarity import ivf_ann_topk

    vecs = [(i, [float(i), 1.0, 0.5, -0.25]) for i in range(5)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = ivf_ann_topk(
        df, df, "vec_id", "vec_id", "embedding", k=2, n_centroids=16, n_probe=4
    )
    assert out.count() > 0  # 5-row corpus, 16 requested centroids: no IndexError


def test_minhash_rejects_indivisible_bands(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=30, bands=8)


def test_minhash_md5_finds_planted_neardups(spark):
    from etl_showcase_spark.operators.dedup import minhash_lsh_pairs_md5

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    base = " ".join(words * 6)
    mutated = " ".join((words * 6)[:-2] + ["zulu", "yankee"])
    unrelated = " ".join(w + "q" for w in reversed(words * 6))
    df = spark.createDataFrame(
        [(1, base), (2, mutated), (3, unrelated), (4, base)], ["doc_id", "text"]
    )
    pairs = minhash_lsh_pairs_md5(
        df, "doc_id", "text", num_hashes=16, bands=4, jaccard_threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in found  # identical docs always collide in every band
    assert all({r.id_a, r.id_b} != {1, 3} for r in pairs)  # unrelated never verified
    for r in pairs:
        assert r.jaccard >= 0.5


def test_lsh_expression_and_gemm_keys_agree(spark):
    # the SQL oracle mirrors (_lsh_posting_sql) are derived from the
    # expression-path definition; the registered plans use the Arrow
    # GEMM path — this pins the two implementations to identical keys
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.similarity import (
        lsh_bucket_keys,
        lsh_bucket_keys_gemm,
        quantize,
    )

    e = table(spark, SF_SMOKE, "embeddings").limit(60)
    n_planes, dim, n_tables = 4, 64, 3
    both = e.select(
        "vec_id",
        F.transform(
            lsh_bucket_keys(quantize(F.col("embedding")), n_planes, dim, n_tables),
            lambda s: s["key"],
        ).alias("expr_keys"),
        lsh_bucket_keys_gemm("embedding", n_planes, dim, n_tables).alias("gemm_keys"),
    ).collect()
    assert both
    for r in both:
        assert list(r.expr_keys) == list(r.gemm_keys), r.vec_id


@pytest.mark.slow
def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        lefts=st.lists(
            st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 50)),
            min_size=1,
            max_size=12,
        ),
        rights=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(0, 50),
                st.integers(-5, 5),
            ),
            min_size=1,
            max_size=12,
        ),
    )
    def check(lefts, rights):
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lefts)], ["key", "ts", "lid"]
        )
        rdf = spark.createDataFrame(rights, ["key", "ts", "val"])
        got = {
            (r.lid): (r.val_asof, r.ts_asof)
            for r in asof_join(ldf, rdf, ["key"], "ts", "ts", ["val"]).collect()
        }
        # pandas reference: backward merge_asof per key, tie-broken to
        # the struct-max (val, ts) among right rows sharing (key, ts) —
        # the operator's documented deterministic choice
        rp = (
            pd.DataFrame(rights, columns=["key", "ts", "val"])
            .sort_values(["key", "ts", "val"])
            .groupby(["key", "ts"], as_index=False)
            .last()
        )
        for i, (k, t) in enumerate(lefts):
            cand = rp[(rp.key == k) & (rp.ts <= t)]
            if len(cand):
                best = cand.iloc[cand.ts.argmax()]
                assert got[i] == (int(best.val), int(best.ts)), (i, k, t)
            else:
                assert got[i] == (None, None), (i, k, t)

    check()


def test_minhash_md5_matches_python_reference(spark):
    # end-to-end salt/band regression guard: the operator's pair set
    # must equal a from-scratch Python replay of the SAME algorithm
    # (caught a real bug where a two-parameter transform lambda rebound
    # the salt index to the array-position column — self-consistent
    # inside Spark, divergent from any external replay)
    import hashlib
    import re
    from itertools import combinations

    from etl_showcase_spark.operators.dedup import minhash_lsh_pairs_md5

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}

    num_hashes, bands, thr = 16, 4, 0.3
    rows = num_hashes // bands

    def grams_of(t):
        toks = re.split(r"\s+", t.strip())
        return list(dict.fromkeys(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )) if len(toks) >= 3 else []

    sigs, gsets = {}, {}
    for did, t in texts.items():
        gs = grams_of(t)
        if not gs:
            continue
        gsets[did] = set(gs)
        sigs[did] = [
            min(hashlib.md5(f"{i}|{g}".encode()).hexdigest() for g in gs)
            for i in range(num_hashes)
        ]
    buckets = {}
    for did, m in sigs.items():
        for b in range(bands):
            key = (b, hashlib.md5(",".join(m[b * rows : (b + 1) * rows]).encode()).hexdigest())
            buckets.setdefault(key, []).append(did)
    expected = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            inter = len(gsets[a] & gsets[b])
            j = inter / (len(gsets[a]) + len(gsets[b]) - inter)
            if j >= thr:
                expected.add((a, b))

    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs_md5(
            docs, "doc_id", "text",
            num_hashes=num_hashes, bands=bands, shingle_n=3, jaccard_threshold=thr,
        ).collect()
    }
    assert got == expected


def test_simhash_matches_python_replay(spark):
    # replay the bit-vote/sign/pack logic in Python from the same token
    # hashes (xxhash64 itself is the trusted primitive, fetched from
    # Spark) — catches any expression-tree drift in the 64-bit unroll
    from etl_showcase_spark.operators.dedup import simhash64
    from etl_showcase_spark.operators.textops import tokens

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(40)
    rows = d.select(
        "doc_id",
        F.transform(tokens(F.col("text")), lambda w: F.xxhash64(w)).alias("hs"),
        simhash64(tokens(F.col("text"))).alias("sig"),
    ).collect()
    assert rows
    for r in rows:
        sig = 0
        for b in range(64):
            vote = sum(1 if ((h >> b) & 1) == 1 else -1 for h in r.hs)
            if vote > 0:
                sig |= 1 << b
        # Spark sig is a signed bigint; compare in unsigned space
        assert sig & (2**64 - 1) == r.sig & (2**64 - 1), r.doc_id


def test_ivf_matches_python_replay(spark):
    # rebuild the whole IVF index + probe search in numpy from the same
    # inputs (seed order comes from Spark's xxhash64, the trusted
    # primitive); the operator's output must match exactly — guards the
    # deterministic index build the rows-only driver check can't see
    import numpy as np

    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.similarity import ivf_ann_topk

    n_centroids, n_probe, k = 8, 3, 5
    e = table(spark, SF_SMOKE, "embeddings")
    rows = e.select(
        "vec_id", "embedding", F.xxhash64(F.col("vec_id")).alias("h")
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.stack([np.asarray(r.embedding, dtype="float64") for r in rows])
    Q = np.floor(V * 1000 + 0.5).astype("int64")
    order = np.argsort([r.h for r in rows], kind="stable")
    seeds = Q[order[:n_centroids]].astype("float64")

    def nearest(mat, C, n_out):
        half = 0.5 * (C * C).sum(axis=1)
        score = mat @ C.T - half
        return np.argsort(-score, axis=1, kind="stable")[:, :n_out]

    cell1 = nearest(Q.astype("float64"), seeds, 1)[:, 0]
    cents = seeds.copy()
    for c in range(n_centroids):
        mask = cell1 == c
        if mask.any():
            cents[c] = Q[mask].sum(axis=0) / mask.sum()
    cell = nearest(Q.astype("float64"), cents, 1)[:, 0]

    queries = [i for i, vid in enumerate(ids) if vid % 50 == 0]
    expected = set()
    for qi in queries:
        probes = nearest(Q[qi : qi + 1].astype("float64"), cents, n_probe)[0]
        cand = [j for j in range(len(ids)) if cell[j] in probes and j != qi]
        nq = np.sqrt(float(Q[qi] @ Q[qi]))
        scored = sorted(
            (
                (-float(Q[qi] @ Q[j]) / (nq * np.sqrt(float(Q[j] @ Q[j]))), ids[j])
                for j in cand
            ),
        )[:k]
        for neg_cos, cid in scored:
            expected.add((ids[qi], cid))

    got = {
        (r.q_id, r.c_id)
        for r in ivf_ann_topk(
            e.filter(F.col("vec_id") % 50 == 0),
            e,
            "vec_id",
            "vec_id",
            "embedding",
            k=k,
            n_centroids=n_centroids,
            n_probe=n_probe,
        ).collect()
    }
    assert got == expected


def test_strict_comparator_flags_dtype_and_nested_cells():
    import pandas as pd

    from etl_showcase_spark.testing import compare_frames

    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1.0, 2.0]})
    assert any("dtype" in p for p in compare_frames(a, b))
    c = pd.DataFrame({"y": [[1, 2], [3]]})
    assert any("unhashable" in p for p in compare_frames(c, c.copy()))


def test_registry_orders_unverified_queries_first(tmp_path, monkeypatch):
    """The driver checks only the first 50 queries() entries, so names
    without a green CORRECTNESS row from any prior round must sort
    ahead of proven ones; a rows-only row keeps a query verified only
    while it still has no oracle."""
    import json

    from etl_showcase_spark import registry

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "hashed_ok": {"hash_match": True, "spark_rows": 3, "err": None},
                "rows_only_still": {
                    "hash_match": None,
                    "spark_rows": 3,
                    "err": "no_oracle",
                },
                "rows_only_gained_oracle": {
                    "hash_match": None,
                    "spark_rows": 3,
                    "err": "no_oracle",
                },
                "failed_hash": {"hash_match": False, "spark_rows": 3, "err": None},
            }
        )
    )
    monkeypatch.setattr(registry, "_REPO_ROOT", tmp_path)
    fake = {
        "hashed_ok": "SELECT 1",
        "rows_only_still": None,
        "rows_only_gained_oracle": "SELECT 1",
        "failed_hash": "SELECT 1",
        "never_checked": "SELECT 1",
    }
    monkeypatch.setattr(
        registry,
        "_REGISTRY",
        {
            n: registry.QuerySpec(n, lambda s, d: None, oracle)
            for n, oracle in fake.items()
        },
    )
    monkeypatch.setattr(registry, "_ensure_loaded", lambda: None)
    monkeypatch.setattr(registry, "_SPECS_CACHE", None)
    # bless current fingerprints for the queries whose rows should
    # count as verified (the fingerprint layer re-queues any name
    # whose blessed fingerprint is absent or stale)
    (tmp_path / "VERIFIED_FINGERPRINTS.json").write_text(
        json.dumps(
            {
                n: registry.query_fingerprint(registry._REGISTRY[n])
                for n in ("hashed_ok", "rows_only_still", "rows_only_gained_oracle")
            }
        )
    )
    monkeypatch.setattr(
        registry, "_FINGERPRINT_PATH", tmp_path / "VERIFIED_FINGERPRINTS.json"
    )
    ordered = list(registry.all_specs())
    unverified_first = ordered[:3]
    # failed/never-checked/regained-oracle queries re-queue for a check
    assert set(unverified_first) == {
        "failed_hash",
        "never_checked",
        "rows_only_gained_oracle",
    }
    assert ordered[3:] in (["hashed_ok", "rows_only_still"],
                           ["rows_only_still", "hashed_ok"])
