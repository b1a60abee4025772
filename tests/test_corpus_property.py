"""Property-based checks for the corpus operators: greedy packing must
respect the token budget and match a sequential reference on randomized
inputs; hash-gated sampling must be monotone in the fraction (nested
samples) and exactly reproducible."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import corpus

_sizes = st.lists(
    st.integers(min_value=1, max_value=700), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None)
@given(_sizes, st.integers(min_value=100, max_value=1000))
def test_pack_greedy_matches_sequential_reference(spark, sizes, budget):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(sizes)], ["doc_id", "n_tokens"]
    )
    # n_shards=1 → one sequential pass, directly comparable to the
    # reference loop below (multi-shard is the same loop per shard,
    # covered by test_pack_greedy_never_exceeds_budget)
    out = corpus.pack_greedy(df, "doc_id", "n_tokens", budget=budget, n_shards=1)
    got = {r.doc_id: r.pack_id for r in out.collect()}

    expect, fill, pack = {}, 0, 0
    for i, t in enumerate(sizes):
        if fill and fill + t > budget:
            pack += 1
            fill = 0
        fill += t
        expect[i] = pack
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True),
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_sample_fraction_nested_and_reproducible(spark, keys, f1, f2):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    lo, hi = sorted((f1, f2))
    small = {r.k for r in corpus.sample_fraction(df, lo, "k").collect()}
    big = {r.k for r in corpus.sample_fraction(df, hi, "k").collect()}
    assert small <= big  # same salt → larger fraction is a superset
    again = {r.k for r in corpus.sample_fraction(df, lo, "k").collect()}
    assert small == again  # pure function of (key, salt, fraction)
