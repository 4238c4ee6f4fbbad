"""The boundary sweep's completeness contract (round-13, VERDICT r12
item 7): every floating/decimal column in the testdata lake is either
scaled+swept by scripts/boundary_sweep.py or explicitly exempted with a
documented reason. A future table/column addition that is neither fails
here instead of silently dodging the 2^53 money-boundary ritual.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_every_numeric_testdata_column_swept_or_exempted():
    from boundary_sweep import EXEMPT_NUMERIC_COLS, SWEPT_COLS, unswept_numeric_columns

    bad = unswept_numeric_columns(SF_DIR)
    assert not bad, (
        f"numeric testdata columns neither boundary-swept nor exempted: {bad} — "
        "add to build_boundary_lake.MONEY + boundary_sweep.MONEY_COLS, or exempt "
        "with a reason in EXEMPT_NUMERIC_COLS"
    )
    # the two lists must not drift into overlap (an exempted column that
    # is also swept means one of the declarations is stale)
    overlap = {c for (_, c) in EXEMPT_NUMERIC_COLS} & SWEPT_COLS
    assert not overlap, f"columns both swept and exempted: {sorted(overlap)}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_swept_cols_match_lake_builder():
    # the sweep's selection regex and the lake builder's scaling list
    # must name the same columns, or a query could be selected for the
    # sweep while reading UNSCALED values (a vacuous pass)
    from boundary_sweep import SWEPT_COLS
    from build_boundary_lake import MONEY

    scaled = {c for cols in MONEY.values() for c in cols}
    assert scaled == SWEPT_COLS, (scaled, SWEPT_COLS)
