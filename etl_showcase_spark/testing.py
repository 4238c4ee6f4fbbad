"""Local replica of the driver's DuckDB-oracle comparison.

The driver hashes (row-count, schema, order-insensitive values) at
sf0.01. This module reproduces that gate locally so every query is
verified before it ships: columns sorted by name, rows sorted by all
columns, values compared EXACTLY (the engine is designed for bit-equal
parity — see functions/numeric.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _stable_repr(v):
    """Engine-independent rendering of nested values (list vs ndarray vs
    Row all normalize to plain tuples of Python scalars)."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return repr(tuple(_stable_repr(x) for x in v))
    if isinstance(v, dict):
        return repr(tuple(sorted((k, _stable_repr(x)) for k, x in v.items())))
    if hasattr(v, "asDict"):  # pyspark Row
        return repr(tuple(sorted((k, _stable_repr(x)) for k, x in v.asDict().items())))
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.integer):
        return int(v)
    return v


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            df[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            # bytes / lists / arrays render to a stable repr for sorting+compare
            df[c] = s.map(_stable_repr)
        elif pd.api.types.is_integer_dtype(s.dtype):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s.dtype):
            df[c] = s.astype("float64")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(str)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def driver_strictness_problems(
    actual: pd.DataFrame, expected: pd.DataFrame
) -> list[str]:
    """Checks mirroring the grading driver's stricter behavior.

    Round-1 lesson (CORRECTNESS_r01.json): the driver's value-hash is
    dtype-sensitive (DuckDB HUGEINT → pandas float64 hash-mismatched a
    bit-identical Spark bigint), and its canonicalizer sorts raw frames
    in pandas, which dies on unhashable cells (lists/arrays/dicts).
    These checks run on the RAW frames, before our own normalization.
    """
    problems: list[str] = []
    shared = sorted(set(actual.columns) & set(expected.columns))
    for c in shared:
        ak, ek = actual[c].dtype.kind, expected[c].dtype.kind
        num = {"i", "u", "f", "b"}
        if ak != ek and (ak in num or ek in num):
            problems.append(
                f"column {c}: dtype kind mismatch spark={actual[c].dtype} "
                f"oracle={expected[c].dtype} (driver hash is dtype-sensitive)"
            )
    for side, df in (("spark", actual), ("oracle", expected)):
        for c in df.columns:
            if df[c].dtype == object:
                bad = df[c].map(
                    lambda v: isinstance(v, (list, dict, np.ndarray))
                )
                if bad.any():
                    problems.append(
                        f"column {c} ({side}): unhashable nested values — "
                        "the driver's pandas sort dies on these; serialize "
                        "to scalars in oracle-checked output"
                    )
    return problems


def compare_frames(actual: pd.DataFrame, expected: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = driver_strictness_problems(actual, expected)
    a, e = canonicalize(actual), canonicalize(expected)
    if list(a.columns) != list(e.columns):
        return [f"column mismatch: spark={list(a.columns)} oracle={list(e.columns)}"]
    if len(a) != len(e):
        problems.append(f"row count mismatch: spark={len(a)} oracle={len(e)}")
        return problems
    for c in a.columns:
        av, ev = a[c], e[c]
        if pd.api.types.is_float_dtype(av.dtype) and pd.api.types.is_float_dtype(ev.dtype):
            avn, evn = av.to_numpy(), ev.to_numpy()
            exact = (avn == evn) | (np.isnan(avn) & np.isnan(evn))
            if not exact.all():
                bad = int((~exact).sum())
                idx = int(np.argmax(~exact))
                close = np.allclose(avn, evn, rtol=1e-9, atol=1e-12, equal_nan=True)
                problems.append(
                    f"column {c}: {bad} float mismatches "
                    f"(first at row {idx}: spark={avn[idx]!r} oracle={evn[idx]!r}; "
                    f"within 1e-9 tolerance: {close})"
                )
        else:
            eq = (av == ev) | (av.isna() & ev.isna())
            if not eq.to_numpy().all():
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"column {c}: {bad} mismatches "
                    f"(first at row {idx}: spark={av.iloc[idx]!r} oracle={ev.iloc[idx]!r})"
                )
    return problems


def spark_to_pandas(df) -> pd.DataFrame:
    return df.toPandas()
