"""Property tests for corpus.temperature_weights — pure driver math, no
Spark session: the invariants that make temperature mixing safe to
point at ANY source histogram."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators.corpus import temperature_weights

_counts = st.dictionaries(
    st.text(min_size=1, max_size=8),
    st.integers(min_value=1, max_value=10**12),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(counts=_counts, alpha=st.floats(min_value=0.01, max_value=1.0))
def test_weights_normalize_and_preserve_order(counts, alpha):
    w = temperature_weights(counts, alpha)
    assert set(w) == set(counts)
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert all(v > 0 for v in w.values())
    # monotone in counts: a strictly bigger source never gets a smaller
    # weight (alpha > 0)
    for a in counts:
        for b in counts:
            if counts[a] > counts[b]:
                assert w[a] >= w[b]


@settings(max_examples=200, deadline=None)
@given(
    counts=_counts.filter(lambda c: len(set(c.values())) > 1),
    lo=st.floats(min_value=0.01, max_value=0.99),
    hi=st.floats(min_value=0.01, max_value=0.99),
)
def test_smaller_alpha_flattens(counts, lo, hi):
    """alpha is a temperature: lower alpha → the max/min weight ratio
    shrinks toward 1 (uniform), never grows."""
    lo, hi = min(lo, hi), max(lo, hi)
    wl, wh = temperature_weights(counts, lo), temperature_weights(counts, hi)
    ratio = lambda w: max(w.values()) / min(w.values())
    assert ratio(wl) <= ratio(wh) + 1e-9


@settings(max_examples=100, deadline=None)
@given(counts=_counts)
def test_alpha_one_is_the_natural_mix(counts):
    w = temperature_weights(counts, 1.0)
    total = sum(counts.values())
    assert all(abs(w[s] - counts[s] / total) < 1e-9 for s in counts)
