"""Independent-reference checks for the round-6 session ops: each
query's result at sf0.001 is recomputed with plain Python (brute
force, stdlib statistics, hand folds) — a second oracle at a second
scale factor, independent of the DuckDB SQL replays that gate sf0.01.
"""

from __future__ import annotations

import hashlib
import statistics

import pyarrow.parquet as pq

from .conftest import SF_SMOKE as SF


def _col(table, name):
    return pq.read_table(f"{SF}/{table}.parquet").to_pydict()[name]


def test_pareto_frontier_matches_bruteforce(spark):
    from etl_showcase_spark.plans.analytics import pareto_frontier_parts

    keys = _col("part", "p_partkey")
    prices = _col("part", "p_retailprice")
    sizes = _col("part", "p_size")
    pts = [
        (k, int(p * 100 + 0.5), int(s)) for k, p, s in zip(keys, prices, sizes)
    ]
    expected = {
        (k, pc, sz)
        for (k, pc, sz) in pts
        if not any(
            bpc <= pc and bsz >= sz and (bpc < pc or bsz > sz)
            for (_, bpc, bsz) in pts
        )
    }
    got = {
        (r.p_partkey, r.price_c, r.size)
        for r in pareto_frontier_parts(spark, SF).collect()
    }
    assert got == expected and got


def test_group_median_matches_statistics(spark):
    from etl_showcase_spark.plans.analytics import event_value_median_exact

    types = _col("events", "event_type")
    values = _col("events", "value")
    by_type: dict[str, list[int]] = {}
    for t, v in zip(types, values):
        by_type.setdefault(t, []).append(int(v * 100 + 0.5))
    rows = {r.event_type: r for r in event_value_median_exact(spark, SF).collect()}
    assert set(rows) == set(by_type)
    for t, cents in by_type.items():
        # statistics.median of ints: exact midpoint average, matching
        # the integer x2 spelling exactly (cents << 2^52)
        assert rows[t].median_cents == float(statistics.median(cents))
        assert rows[t].n_events == len(cents)


def test_cusum_changepoint_matches_python_fold(spark):
    from etl_showcase_spark.plans.analytics import orders_volume_changepoint

    days = _col("orders", "o_orderdate")
    counts: dict[object, int] = {}
    for d in days:
        day = d.date()  # parquet column is a timestamp; the query casts to DATE
        counts[day] = counts.get(day, 0) + 1
    series = sorted(counts.items())
    nd, total = len(series), sum(c for _, c in series)
    run, best = 0, None
    for day, c in series:
        run += c * nd - total
        if best is None or abs(run) > abs(best[1]):
            best = (day, run)
    r = orders_volume_changepoint(spark, SF).collect()[0]
    assert (r.changepoint_day, r.cusum_peak) == best
    assert (r.n_days, r.total_orders) == (nd, total)


def test_image_ahash_matches_reference(spark):
    from etl_showcase_spark.plans.multimodal import image_ahash_fingerprint

    ids = _col("documents", "doc_id")
    texts = _col("documents", "text")
    rows = {r.doc_id: r for r in image_ahash_fingerprint(spark, SF).collect()}
    for did, text in zip(ids, texts):
        w, h = 8 + did % 9, 6 + did % 5
        body = (text or "").encode("utf-8")
        need = w * h * 3
        pix = (body * (-(-need // len(body))))[:need] if body else bytes(need)
        ri = [min(i * h // 8, h - 1) for i in range(8)]
        ci = [min(j * w // 8, w - 1) for j in range(8)]
        gray = [
            sum(pix[(r * w + c) * 3 + ch] for ch in range(3))
            for r in ri
            for c in ci
        ]
        mean_floor = sum(gray) // 64
        expect = "".join("1" if g > mean_floor else "0" for g in gray)
        assert rows[did].ahash == expect
        assert rows[did].gray_sum == sum(gray)


def test_token_drift_matches_python(spark):
    from etl_showcase_spark.plans.llm_text import token_distribution_drift

    ids = _col("documents", "doc_id")
    texts = _col("documents", "text")
    ctr: dict[str, int] = {}
    cte: dict[str, int] = {}
    for did, text in zip(ids, texts):
        is_test = hashlib.md5(str(did).encode()).hexdigest()[0] < "4"
        side = cte if is_test else ctr
        for tok in (text or "").split():
            side[tok] = side.get(tok, 0) + 1
    n_tr, n_te = sum(ctr.values()), sum(cte.values())
    union = set(ctr) | set(cte)
    num = sum(abs(ctr.get(t, 0) * n_te - cte.get(t, 0) * n_tr) for t in union)
    r = token_distribution_drift(spark, SF).collect()[0]
    assert (r.n_terms_union, r.n_train_tokens, r.n_test_tokens) == (
        len(union),
        n_tr,
        n_te,
    )
    assert r.tvd_numerator == num


def test_weighted_jaccard_matches_bruteforce(spark):
    from etl_showcase_spark.plans.llm_text import weighted_jaccard_neardup

    ids = _col("documents", "doc_id")
    texts = _col("documents", "text")
    sets = {}
    for did, text in zip(ids, texts):
        toks = (text or "").split()
        sets[did] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    docfreq: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            docfreq[g] = docfreq.get(g, 0) + 1
    n_docs = sum(1 for s in sets.values() if s)
    weight = {
        g: (n_docs // df).bit_length()
        for g, df in docfreq.items()
        if df < 100
    }
    expected = {}
    docs = sorted(sets)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            inter = sum(weight.get(g, 0) for g in sets[a] & sets[b] if g in weight)
            wa = sum(weight.get(g, 0) for g in sets[a] if g in weight)
            wb = sum(weight.get(g, 0) for g in sets[b] if g in weight)
            union = wa + wb - inter
            if inter and 100 * inter >= 5 * union:
                expected[(a, b)] = (inter, union)
    got = {
        (r.id_a, r.id_b): (r.w_inter, r.w_union)
        for r in weighted_jaccard_neardup(spark, SF).collect()
    }
    assert got == expected and got


def test_kcore_matches_python_peel(spark):
    from etl_showcase_spark.plans.curation import (
        _CORE_K,
        _CORE_ROUNDS,
        kcore_copurchase,
    )

    orders = _col("lineitem", "l_orderkey")
    parts = _col("lineitem", "l_partkey")
    baskets: dict[int, set[int]] = {}
    for o, p in zip(orders, parts):
        baskets.setdefault(o, set()).add(p)
    edges = {
        (a, b)
        for items in baskets.values()
        for a in items
        for b in items
        if a < b
    }
    for _ in range(_CORE_ROUNDS):
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= _CORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    expected: dict[int, int] = {}
    for a, b in edges:
        expected[a] = expected.get(a, 0) + 1
        expected[b] = expected.get(b, 0) + 1
    got = {r.part_key: r.core_degree for r in kcore_copurchase(spark, SF).collect()}
    # equality holds whether or not the smoke-scale graph has an
    # 80-core at all (at sf0.001 it usually peels to empty)
    assert got == expected


def test_bitlen_log2_lemma():
    """The fixed-point log2 identity behind unigram_lm_surprisal,
    pmi_collocation_bits, and weighted_jaccard_neardup:
    LENGTH(bin(num div den)) - 1 == floor(log2(num/den)) for
    num >= den >= 1. Verified against the exact integer definition
    (2^k <= num/den < 2^(k+1)  <=>  den<<k <= num < den<<(k+1)),
    no floats involved.
    """
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(num=st.integers(1, 10**15), den=st.integers(1, 10**15))
    @settings(max_examples=300, deadline=None)
    def check(num, den):
        if num < den:
            num, den = den, num
        k = (num // den).bit_length() - 1
        assert (den << k) <= num < (den << (k + 1))

    check()
