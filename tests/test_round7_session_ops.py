"""Independent-reference checks for the round-7 session ops: each
query's result at sf0.001 is recomputed with plain Python (brute
force, dict folds, hashlib) — a second oracle at a second scale
factor, independent of the DuckDB SQL replays that gate sf0.01.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow.parquet as pq

from .conftest import SF_SMOKE as SF


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet").to_pydict()
    return list(zip(t["doc_id"], t["text"], t["lang"], t["source"]))


def _toks(text: str) -> list[str]:
    return [t for t in text.strip().split() if t]


def _grams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_compression_ratio_matches_python(spark):
    from etl_showcase_spark.plans.corpus import tokenizer_compression_ratio

    agg: dict[str, list[int]] = {}
    for _, text, lang, _s in _docs():
        a = agg.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(text.encode("utf-8"))
        a[2] += len(text)
        a[3] += len(_toks(text))
    rows = {r.lang: r for r in tokenizer_compression_ratio(spark, SF).collect()}
    expected = {k: v for k, v in agg.items() if v[3] > 0}
    assert set(rows) == set(expected) and rows
    for lang, (nd, nb, nc, nt) in expected.items():
        r = rows[lang]
        assert (r.n_docs, r.total_bytes, r.total_chars, r.total_tokens) == (
            nd,
            nb,
            nc,
            nt,
        )
        assert r.bytes_per_token == nb / nt and r.chars_per_token == nc / nt


def test_novelty_rate_matches_bruteforce(spark):
    from etl_showcase_spark.plans.corpus import ngram_novelty_rate

    per_doc: dict[int, set[str]] = {}
    first: dict[str, int] = {}
    for did, text, _l, _s in _docs():
        gs = set(_grams(_toks(text), 8))
        if gs:
            per_doc[did] = gs
            for g in gs:
                if g not in first or did < first[g]:
                    first[g] = did
    rows = {r.doc_id: r for r in ngram_novelty_rate(spark, SF).collect()}
    assert set(rows) == set(per_doc) and rows
    for did, gs in per_doc.items():
        novel = sum(1 for g in gs if first[g] == did)
        r = rows[did]
        assert (r.n_grams, r.n_novel) == (len(gs), novel)
        assert r.novelty_rate == novel / len(gs)


def test_vocab_growth_matches_python(spark):
    from etl_showcase_spark.plans.corpus import vocab_growth_curve

    docs = _docs()
    n = len(docs)
    order = sorted(d[0] for d in docs)
    decile = {did: (i * 10) // n + 1 for i, did in enumerate(order)}
    first: dict[str, int] = {}
    for did, text, _l, _s in docs:
        for t in _toks(text):
            if t not in first or did < first[t]:
                first[t] = did
    new_terms = Counter(decile[d] for d in first.values())
    docs_in = Counter(decile.values())
    rows = sorted(vocab_growth_curve(spark, SF).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == sorted(docs_in)
    ds = vs = 0
    for r in rows:
        ds += docs_in[r.decile]
        vs += new_terms.get(r.decile, 0)
        assert (r.docs_seen, r.new_terms, r.vocab_size) == (
            ds,
            new_terms.get(r.decile, 0),
            vs,
        )
    assert ds == n and vs == len(first)


def test_source_overlap_matches_bruteforce(spark):
    from etl_showcase_spark.plans.corpus import source_ngram_overlap

    by_src: dict[str, set[str]] = {}
    for _d, text, _l, src in _docs():
        by_src.setdefault(src, set()).update(_grams(_toks(text), 8))
    expected = {}
    for a in by_src:
        for b in by_src:
            if a < b and by_src[a] & by_src[b]:
                expected[(a, b)] = len(by_src[a] & by_src[b])
    rows = {(r.source_a, r.source_b): r for r in source_ngram_overlap(spark, SF).collect()}
    assert set(rows) == set(expected) and rows
    for (a, b), shared in expected.items():
        r = rows[(a, b)]
        na, nb = len(by_src[a]), len(by_src[b])
        assert (r.shared_grams, r.n_a, r.n_b) == (shared, na, nb)
        assert r.jaccard == shared / (na + nb - shared)


def test_sentence_boilerplate_matches_bruteforce(spark):
    from etl_showcase_spark.plans.corpus import common_sentence_boilerplate

    occ: Counter = Counter()
    docs_of: dict[str, set[int]] = {}
    for did, text, _l, _s in _docs():
        for sent in text.split(". "):
            if len(sent) >= 30:
                occ[sent] += 1
                docs_of.setdefault(sent, set()).add(did)
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = common_sentence_boilerplate(spark, SF).collect()
    assert [(r.sentence, r.n_occurrences) for r in rows] == top
    for rk, r in enumerate(rows, 1):
        assert r.rnk == rk and r.n_docs == len(docs_of[r.sentence])


def test_perplexity_bands_match_python_fold(spark):
    from etl_showcase_spark.plans.corpus import perplexity_band_mix

    docs = _docs()
    tc: Counter = Counter()
    for _d, text, _l, _s in docs:
        tc.update(_toks(text))
    total = sum(tc.values())
    bits = {t: (total // c).bit_length() - 1 for t, c in tc.items()}
    bpk: dict[int, int] = {}
    lang_of: dict[int, str] = {}
    for did, text, lang, _s in docs:
        ts = _toks(text)
        if ts:
            bpk[did] = sum(bits[t] for t in ts) * 1000 // len(ts)
            lang_of[did] = lang
    n = len(bpk)
    vals = sorted(bpk.values())
    cum, cut1, cut2 = 0, None, None
    for v in sorted(set(vals)):
        cum += vals.count(v)
        if cut1 is None and cum >= (n + 2) // 3:
            cut1 = v
        if cut2 is None and cum >= (2 * n + 2) // 3:
            cut2 = v
    expected: Counter = Counter()
    lang_tot: Counter = Counter()
    for did, v in bpk.items():
        band = "head" if v <= cut1 else ("middle" if v <= cut2 else "tail")
        expected[(lang_of[did], band)] += 1
        lang_tot[lang_of[did]] += 1
    rows = {(r.lang, r.band): r for r in perplexity_band_mix(spark, SF).collect()}
    assert set(rows) == set(expected) and rows
    for key, cnt in expected.items():
        assert rows[key].n_docs == cnt
        assert rows[key].lang_share == cnt / lang_tot[key[0]]


def _support_edges() -> set[tuple[int, int]]:
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    baskets: dict[int, set[int]] = {}
    for ok, pk in zip(t["l_orderkey"], t["l_partkey"]):
        baskets.setdefault(ok, set()).add(pk)
    support: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                support[(u, v)] += 1
    return {e for e, c in support.items() if c >= 2}


def test_link_prediction_matches_bruteforce(spark):
    from etl_showcase_spark.plans.corpus import link_prediction_scores

    edges = _support_edges()
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    cand = {}
    for u in nbrs:
        for v in nbrs:
            if u < v and (u, v) not in edges:
                cn = len(nbrs[u] & nbrs[v])
                if cn:
                    cand[(u, v)] = cn
    top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    rows = link_prediction_scores(spark, SF).collect()
    assert [((r.part_u, r.part_v), r.common_neighbors) for r in rows] == top
    for r in rows:
        du, dv = len(nbrs[r.part_u]), len(nbrs[r.part_v])
        assert (r.deg_u, r.deg_v, r.pref_attach) == (du, dv, du * dv)
        assert r.nbr_jaccard == r.common_neighbors / (du + dv - r.common_neighbors)


def test_containment_matches_md5_replay(spark):
    from etl_showcase_spark.plans.corpus import minhash_containment_neardup
    from etl_showcase_spark.plans.llm_text import _MH_BANDS, _MH_HASHES

    sh = {}
    for did, text, _l, _s in _docs():
        gs = set(_grams(_toks(text), 3))
        if gs:
            sh[did] = gs
    rows_per_band = _MH_HASHES // _MH_BANDS

    def _sig(gs):
        return [
            min(hashlib.md5(f"{i}|{g}".encode()).hexdigest() for g in gs)
            for i in range(_MH_HASHES)
        ]

    band_keys = {
        did: [
            hashlib.md5(
                ",".join(s[b * rows_per_band : (b + 1) * rows_per_band]).encode()
            ).hexdigest()
            for b in range(_MH_BANDS)
        ]
        for did, s in ((d, _sig(g)) for d, g in sh.items())
    }
    ids = sorted(sh)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if any(x == y for x, y in zip(band_keys[a], band_keys[b])):
                inter = len(sh[a] & sh[b])
                least = min(len(sh[a]), len(sh[b]))
                if 100 * inter >= 60 * least:
                    expected[(a, b)] = (inter, len(sh[a]), len(sh[b]))
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.n_a, r.n_b)
        for r in minhash_containment_neardup(spark, SF).collect()
    }
    assert got == expected


def test_bm25_matches_python_fold(spark):
    from etl_showcase_spark.plans.corpus import _BM25_TERMS, bm25_doc_ranking

    docs = _docs()
    toks = {d: _toks(t) for d, t, _l, _s in docs}
    n = len(toks)
    total = sum(len(v) for v in toks.values())
    a = total // n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in _BM25_TERMS
    }
    scores: dict[int, list[int]] = {}
    for did, v in toks.items():
        dl = len(v)
        for q in _BM25_TERMS:
            tf = v.count(q)
            if tf == 0:
                continue
            idf_bits = (n // df[q]).bit_length() - 1
            sat = (1048576 * 22 * tf * a) // (10 * a * tf + 3 * a + 9 * dl)
            scores.setdefault(did, []).append((idf_bits + 1) * sat)
    ranked = sorted(
        ((sum(cs), len(cs), did) for did, cs in scores.items()),
        key=lambda x: (-x[0], x[2]),
    )[:50]
    rows = bm25_doc_ranking(spark, SF).collect()
    assert [(r.score_fp, r.n_terms_hit, r.doc_id) for r in rows] == ranked
    assert [r.rnk for r in rows] == list(range(1, len(ranked) + 1))


def test_bigram_lm_matches_python_fold(spark):
    from etl_showcase_spark.plans.corpus import bigram_lm_next_token

    docs = _docs()
    counts: Counter = Counter()
    positions = []
    for _d, text, lang, _s in docs:
        ts = _toks(text)
        for i in range(len(ts) - 1):
            counts[(ts[i], ts[i + 1])] += 1
            positions.append((lang, ts[i], ts[i + 1]))
    pred = {}
    for (w1, w2), c in counts.items():
        cur = pred.get(w1)
        if cur is None or (-c, w2) < cur[0]:
            pred[w1] = ((-c, w2), w2)
    expected: dict[str, list[int]] = {}
    for lang, w1, w2 in positions:
        e = expected.setdefault(lang, [0, 0])
        e[0] += 1
        e[1] += int(pred[w1][1] == w2)
    rows = {r.lang: r for r in bigram_lm_next_token(spark, SF).collect()}
    assert set(rows) == set(expected)
    for lang, (np_, nc) in expected.items():
        r = rows[lang]
        assert (r.n_positions, r.n_correct) == (np_, nc)
        assert r.accuracy == nc / np_


def test_event_transitions_match_python(spark):
    from etl_showcase_spark.plans.corpus import event_transition_matrix

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).to_pydict()
    per_user: dict[int, list] = {}
    for u, ts, eid, et in zip(
        t["user_id"], t["ts"], t["event_id"], t["event_type"]
    ):
        per_user.setdefault(u, []).append((ts, eid, et))
    trans: Counter = Counter()
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    margins: Counter = Counter()
    for (a, _b), c in trans.items():
        margins[a] += c
    rows = {
        (r.from_type, r.to_type): r
        for r in event_transition_matrix(spark, SF).collect()
    }
    assert set(rows) == set(trans)
    for (a, b), c in trans.items():
        r = rows[(a, b)]
        assert (r.n_transitions, r.n_from) == (c, margins[a])
        assert r.p_transition == c / margins[a]


def _py_soundex(token: str) -> str:
    t = token.upper()
    m = {}
    for chars, d in (
        ("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
        ("L", "4"), ("MN", "5"), ("R", "6"),
    ):
        for ch in chars:
            m[ch] = d
    digits = [m.get(ch, "0") for ch in t[1:]]
    out = []
    for d in digits:
        if not out or out[-1] != d:
            out.append(d)
    code = "".join(c for c in out if c != "0")
    return (t[0] + code[:3]).ljust(4, "0")


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_soundex_blocking_matches_python(spark):
    from etl_showcase_spark.plans.corpus import soundex_token_blocking

    import re

    part = pq.read_table(f"{SF}/part.parquet", columns=["p_name"]).to_pydict()
    nation = pq.read_table(f"{SF}/nation.parquet", columns=["n_name"]).to_pydict()
    region = pq.read_table(f"{SF}/region.parquet", columns=["r_name"]).to_pydict()
    events = pq.read_table(f"{SF}/events.parquet", columns=["event_type"]).to_pydict()
    tokens = set()
    for name in part["p_name"]:
        tokens.update(re.sub(r"[^a-z]", "", w.lower()) for w in name.split(" "))
    tokens.update(re.sub(r"[^a-z]", "", n.lower()) for n in nation["n_name"])
    tokens.update(re.sub(r"[^a-z]", "", n.lower()) for n in region["r_name"])
    tokens.update(re.sub(r"[^a-z]", "", n.lower()) for n in events["event_type"])
    for _d, text, _l, _s in _docs():
        tokens.update(re.sub(r"[^a-z]", "", w.lower()) for w in text.split(" "))
    tokens.discard("")
    blocks: dict[str, list[str]] = {}
    for tk in tokens:
        blocks.setdefault(_py_soundex(tk), []).append(tk)
    expected = {}
    for code, toks in blocks.items():
        toks = sorted(toks)
        min_lev = (
            min(
                _py_lev(a, b)
                for i, a in enumerate(toks)
                for b in toks[i + 1 :]
            )
            if len(toks) > 1
            else None
        )
        expected[code] = (
            len(toks),
            len(toks) * (len(toks) - 1) // 2,
            ",".join(toks),
            min_lev,
        )
    rows = soundex_token_blocking(spark, SF).collect()
    got = {
        r.code: (r.block_size, r.candidate_pairs, r.members, r.min_lev) for r in rows
    }
    assert got == expected
    assert any(v[0] > 1 for v in expected.values())  # non-vacuous: real blocks


def test_dedup_impact_consistency(spark):
    from etl_showcase_spark.plans.corpus import dedup_impact_report

    docs = _docs()
    raw_docs = len(docs)
    raw_tokens = sum(len(_toks(t)) for _d, t, _l, _s in docs)
    texts = {}
    for _d, t, _l, _s in docs:
        texts.setdefault(t, len(_toks(t)))
    rows = {r.stage: r for r in dedup_impact_report(spark, SF).collect()}
    assert set(rows) == {"raw", "exact_dedup", "neardup_canonical"}
    assert (rows["raw"].n_docs, rows["raw"].n_tokens) == (raw_docs, raw_tokens)
    assert rows["exact_dedup"].n_docs == len(texts)
    assert rows["exact_dedup"].n_tokens == sum(texts.values())
    near = rows["neardup_canonical"]
    assert 0 < near.n_docs <= rows["exact_dedup"].n_docs <= raw_docs
    assert near.doc_share == near.n_docs / raw_docs
    assert near.token_share == near.n_tokens / raw_tokens
    assert rows["raw"].doc_share == 1.0 and rows["raw"].token_share == 1.0
