"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.13 L4).

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
codegen-friendly) — no Python UDFs. Token/shingle arrays stay inside
Tungsten rows; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer (the corpus is space-separated lowercase words;
# the regex handles runs/tabs for robustness on real corpora).
TOKEN_RE = r"\s+"

# BPE-ish subword splitter: letters runs, digit runs, or single
# non-alnum marks — a cheap deterministic proxy for tokenizer counting.
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

FINGERPRINT_MOD = 1_000_000_007
CHAR_MOD = 2_147_483_647


def tokens(col: Column | str) -> Column:
    # the empty-string filter matters: split(trim(''), '\s+') returns
    # [''], which would count empty/whitespace-only documents as having
    # ONE token and let them through min-token quality gates
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), TOKEN_RE), lambda t: t != "")


def shingles(tok: Column, n: int) -> Column:
    """Word n-grams joined with spaces; empty array when too short."""
    starts = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(tok, i, n), " "))
    return F.when(F.size(tok) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Count of BPE-ish subword tokens via regexp_count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_RE))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic document quality signals (length/punct/stopword
    ratios — the classic pre-training quality filters)."""
    c = F.col(col) if isinstance(col, str) else col
    tok = tokens(c)
    n_tok = F.size(tok)
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in")])
    n_stop = F.size(F.array_intersect(F.array_distinct(tok), stop))
    return {
        "n_chars": F.length(c),
        "n_tokens": n_tok,
        "n_distinct_tokens": F.size(F.array_distinct(tok)),
        # true mean token length (sum of token lengths / count) — the
        # chars-minus-separators shortcut assumed single-space
        # separation and counted whitespace runs as token mass
        "avg_token_len": F.aggregate(
            tok, F.lit(0), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n_tok,
        "distinct_ratio": F.size(F.array_distinct(tok)).cast("double") / n_tok,
        "stopword_hits": n_stop,
        "punct_marks": F.regexp_count(c, F.lit(r"[^\w\s]")),
    }


# PII-ish surface patterns (count-only scrub signals; engine-portable
# regex subset — character classes + bounded quantifiers only).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
DIGIT_RUN_RE = r"[0-9]{6,}"


def pii_pattern_counts(col: Column | str) -> dict[str, Column]:
    """Per-document counts of scrub-worthy surface patterns (emails,
    URLs, long digit runs) — the cheap first pass of a PII pipeline;
    counts drive routing to the (expensive) redaction stage."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
        "n_urls": F.regexp_count(c, F.lit(URL_RE)),
        "n_digit_runs": F.regexp_count(c, F.lit(DIGIT_RUN_RE)),
    }


def repetition_ratio(col: Column | str, n: int = 2) -> Column:
    """Duplicate word-n-gram fraction, 1 - distinct/total (the
    Gopher-style repetition signal: boilerplate and looped generations
    score high). NULL for documents too short to have an n-gram."""
    grams = shingles(tokens(col), n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double") / total.cast("double"),
    ).otherwise(F.lit(None).cast("double"))


# Gopher-style quality gate bounds (word count, mean word length,
# symbol ratio) — published pre-training filter heuristics.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1


def gopher_quality_flags(col: Column | str) -> dict[str, Column]:
    """Per-document pass/fail flags for the classic quality-filter
    rules, plus the composite keep decision. Flags are INT 0/1 (not
    boolean) so oracle hash comparison is dtype-stable."""
    c = F.col(col) if isinstance(col, str) else col
    tok = tokens(c)
    n_tok = F.size(tok)
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(tok, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tok.cast("double"),
    ).otherwise(F.lit(None).cast("double"))
    n_chars = F.length(c)
    symbol_ratio = F.when(
        n_chars > 0,
        F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double") / n_chars.cast("double"),
    ).otherwise(F.lit(None).cast("double"))
    f_words = (
        (n_tok >= GOPHER_MIN_WORDS) & (n_tok <= GOPHER_MAX_WORDS)
    ).cast("int")
    f_mean = (
        mean_len.isNotNull()
        & (mean_len >= GOPHER_MIN_MEAN_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_LEN)
    ).cast("int")
    f_symbol = (
        symbol_ratio.isNotNull() & (symbol_ratio < GOPHER_MAX_SYMBOL_RATIO)
    ).cast("int")
    return {
        "n_tokens": n_tok,
        "mean_word_len": mean_len,
        "symbol_ratio": symbol_ratio,
        "flag_word_count": f_words,
        "flag_mean_word_len": f_mean,
        "flag_symbol_ratio": f_symbol,
        "keep": (f_words.cast("boolean") & f_mean.cast("boolean") & f_symbol.cast("boolean")).cast("int"),
    }


# Tiny per-language marker profiles (n-gram-heuristic language ID).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit score per language over the distinct token set."""
    tok = F.array_distinct(tokens(col))
    return {
        lang: F.size(F.array_intersect(tok, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def predicted_lang(col: Column | str) -> Column:
    """Argmax language with deterministic alphabetical tie-break
    ('unknown' when every score is zero)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    # fold in reverse alphabetical order so earlier langs win ties
    for lang in sorted(scores, reverse=True):
        pred = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return pred


def char_hash(word: Column) -> Column:
    """Deterministic per-word hash: polynomial over character codes,
    mod CHAR_MOD — engine-portable (same arithmetic runs in the DuckDB
    oracle via list_reduce)."""
    # index-based char walk (split(w, "") has engine-specific empty-string
    # edge behavior; substr is unambiguous and mirrors the oracle's w[i])
    codes = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.ascii(word.substr(i, F.lit(1))).cast("bigint"),
    )
    return F.aggregate(
        codes, F.lit(0).cast("bigint"), lambda acc, c: (acc * 131 + c) % CHAR_MOD
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Order-sensitive rolling document fingerprint: fold token hashes
    with a second polynomial (mod FINGERPRINT_MOD). Two documents with
    the same token sequence — and only those — collide (up to hash
    collisions), giving a cheap content-defined identity for dedup
    bookkeeping at scale."""
    tok = tokens(col)
    hashes = F.transform(tok, char_hash)
    return F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % FINGERPRINT_MOD,
    )


def sentence_udtf():
    """Python UDTF (SURVEY.md §2.11): lateral sentence splitter —
    one output row per period-delimited sentence with its word count.

    Built as a factory so the class pickles by value (executor workers
    never import this package). A UDTF is the right tool when one input
    row yields a variable number of typed rows and the logic is easier
    in Python than as explode(expr) — here it doubles as the §2.11
    surface proof; the explode-based twin lives in the oracle SQL.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence string, n_words int")
    class SplitSentences:
        def eval(self, text):
            if text is None:
                return
            for seg in text.split("."):
                s = seg.strip()
                if s:
                    yield s, len(s.split())

    return SplitSentences


def grouped_trend(df, key_col: str, ts_col: str, val_col: str):
    """Grouped-map applyInPandas (SURVEY.md §2.11): per-key OLS slope of
    value over time — one pandas frame per key, the API shape for
    model-ish per-group computations (each group must fit one worker's
    memory; keys are hash-distributed, so scale-out is by key count).
    The output schema declares ``key`` as bigint — key_col must be an
    integral column (as must grouped_rank_trend's below).

    Deterministic: rows are sorted inside the group and the closed-form
    OLS runs on float64 in a fixed order.
    """

    def fit(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values([ts_col])
        x = pdf[ts_col].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        y = pdf[val_col].to_numpy(dtype="float64")
        n = len(x)
        if n < 2 or np.ptp(x) == 0:
            slope = 0.0
        else:
            xm, ym = x.mean(), y.mean()
            slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0]],
                "n_obs": [n],
                "slope_per_hour": [slope * 3600.0],
            }
        )

    # explicit hash repartition on the key BEFORE the grouped map: the
    # grouped frame is byte-light, so AQE's size-based coalescing would
    # funnel thousands of per-group Python calls through 1-2 partitions
    # (measured 5x at sf0.1); a fixed partition count keeps every core
    # busy and satisfies the groupBy's required distribution, so no
    # second exchange is added
    n_part = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key_col, ts_col, val_col)
        .repartition(n_part, F.col(key_col))
        .groupBy(key_col)
        .applyInPandas(fit, "key long, n_obs long, slope_per_hour double")
    )


def grouped_rank_trend(df, key_col: str, ts_col: str, order_col: str, val_col: str):
    """Grouped-map applyInPandas (SURVEY.md §2.11) with EXACT arithmetic:
    per-key OLS slope of value over event rank 1..n (rows ordered by
    (ts, order_col) — a deterministic total order).

    The value column is 2-decimal clean, so it converts to integer
    cents exactly; every OLS sum is then a Python bigint (no float
    accumulation, no order sensitivity) and the single final division
    is IEEE-identical in any engine — which is why this grouped-map
    Python operator can be hash-checked against a DuckDB oracle, unlike
    the float-accumulating time-based variant above (grouped_trend).
    """

    def fit(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values([ts_col, order_col])
        n = len(pdf)
        sx = n * (n + 1) // 2
        sxx = n * (n + 1) * (2 * n + 1) // 6
        vals = pdf[val_col].to_numpy(dtype="float64")
        valid = ~np.isnan(vals)  # NULL arrives as NaN; SQL SUM skips
        ranks = np.arange(1, n + 1, dtype="int64")[valid]  # rank kept
        # np.rint is round-half-even like Python round(); the 2-decimal
        # -clean inputs never land on a .5 tie, so cents are exact
        cents = np.rint(vals[valid] * 100).astype("int64")
        # int64-exact envelope, checked on the actual worst-case sum:
        # |sxy| <= max|cents| * n(n+1)/2, computed in Python bigints so
        # the guard itself can't wrap. (A cap on max|cents| alone does
        # NOT bound sxy — n(n+1)/2 multiplies it by up to ~5e11.)
        maxc = 0 if cents.size == 0 else int(np.abs(cents).max())
        if maxc * (n * (n + 1) // 2) < 1 << 62:
            sy = int(cents.sum())
            sxy = int((ranks * cents).sum())
        else:  # arbitrary-precision fallback — same math, Python ints
            sy = sum(int(c) for c in cents)
            sxy = sum(int(r) * int(c) for r, c in zip(ranks, cents))
        num = n * sxy - sx * sy  # exact (cents · rank)
        den = n * sxx - sx * sx  # exact
        # float(num)/float(den), NOT num/den: the oracle casts each
        # operand to DOUBLE before dividing, and for |num| > 2^53
        # Python's correctly-rounded bigint division would differ in
        # the last ulp from double÷double
        slope = 0.0 if den == 0 else (float(num) / float(den)) / 100.0
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0]],
                "n_obs": [n],
                "slope_per_event": [slope],
            }
        )

    # same AQE-coalescing guard as grouped_trend: pre-partition on the
    # key so the per-group Python calls parallelize (5x at sf0.1)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key_col, ts_col, order_col, val_col)
        .repartition(n_part, F.col(key_col))
        .groupBy(key_col)
        .applyInPandas(fit, "key long, n_obs long, slope_per_event double")
    )


def grouped_rank_trend_arrow(df, key_col: str, ts_col: str, order_col: str, val_col: str):
    """Spark 4 grouped ``applyInArrow`` twin of grouped_rank_trend —
    the same exact integer OLS, but each group arrives as a
    pyarrow.Table (no per-group pandas construction). Equality with
    the pandas variant is asserted in tests/test_textops_edges.py;
    use whichever binding fits the caller — the math and results are
    bit-identical.
    """
    def fit(t):
        import numpy as np
        import pyarrow as pa

        ts = t[ts_col].to_numpy(zero_copy_only=False)
        ordv = t[order_col].to_numpy(zero_copy_only=False)
        vals = t[val_col].to_numpy(zero_copy_only=False).astype("float64")
        order = np.lexsort((ordv, ts))
        vals = vals[order]
        n = len(vals)
        sx = n * (n + 1) // 2
        sxx = n * (n + 1) * (2 * n + 1) // 6
        valid = ~np.isnan(vals)
        ranks = np.arange(1, n + 1, dtype="int64")[valid]
        cents = np.rint(vals[valid] * 100).astype("int64")
        maxc = 0 if cents.size == 0 else int(np.abs(cents).max())
        if maxc * (n * (n + 1) // 2) < 1 << 62:
            sy = int(cents.sum())
            sxy = int((ranks * cents).sum())
        else:
            sy = sum(int(c) for c in cents)
            sxy = sum(int(r) * int(c) for r, c in zip(ranks, cents))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = 0.0 if den == 0 else (float(num) / float(den)) / 100.0
        return pa.table(
            {
                "key": pa.array([t[key_col][0].as_py()], type=pa.int64()),
                "n_obs": pa.array([n], type=pa.int64()),
                "slope_per_event": pa.array([slope], type=pa.float64()),
            }
        )

    n_part = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key_col, ts_col, order_col, val_col)
        .repartition(n_part, F.col(key_col))
        .groupBy(key_col)
        .applyInArrow(fit, "key long, n_obs long, slope_per_event double")
    )
