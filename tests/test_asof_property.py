"""Property-based check: the engine's as-of join must agree with pandas
``merge_asof`` (the de-facto reference implementation) on randomized
inputs — keys, timestamps (with collisions), and missing matches."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import relational

_ts = st.integers(min_value=0, max_value=50)
_key = st.integers(min_value=1, max_value=3)


@st.composite
def _sides(draw):
    left = draw(
        st.lists(st.tuples(_key, _ts), min_size=1, max_size=12, unique=True)
    )
    right = draw(
        st.lists(st.tuples(_key, _ts), min_size=0, max_size=12, unique=True)
    )
    return left, right


@settings(max_examples=12, deadline=None)
@given(_sides())
def test_asof_backward_matches_pandas(spark, sides):
    left_rows, right_rows = sides
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], ["lid", "k", "t"]
    )
    right = spark.createDataFrame(
        [(k, t, f"r{k}_{t}") for (k, t) in right_rows] or [(None, None, None)],
        "k long, rt long, val string",
    ).filter("k IS NOT NULL")

    got = {
        r.lid: r.val
        for r in relational.asof_join(
            left, right, ["k"], "t", "rt", ["val"]
        ).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], columns=["lid", "k", "t"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(k, t, f"r{k}_{t}") for (k, t) in right_rows], columns=["k", "rt", "val"]
    ).sort_values("rt", kind="mergesort")
    if rp.empty:
        expect = {i: None for i in lp.lid}
    else:
        merged = pd.merge_asof(
            lp, rp, left_on="t", right_on="rt", by="k", direction="backward"
        )
        expect = {
            int(r.lid): (None if pd.isna(r.val) else r.val)
            for r in merged.itertuples()
        }
    assert got == expect
