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


@settings(max_examples=200, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.integers(min_value=1, max_value=10**12),
        min_size=2,
        max_size=20,
    ),
    alpha=st.floats(min_value=0.01, max_value=1.0),
    seed=st.randoms(use_true_random=False),
)
def test_weights_invariant_under_dict_order(counts, alpha, seed):
    """VERDICT r12 item 7c: the docstring claims bit-for-bit
    reproducible normalization because the accumulation runs in
    SORTED-key order — so a permuted input dict (different insertion
    order, same histogram) must produce IDENTICAL floats, not merely
    close ones. This is what makes the downstream integer gate
    thresholds (and therefore every kept row) independent of how the
    caller happened to build the counts mapping."""
    items = list(counts.items())
    seed.shuffle(items)
    permuted = dict(items)
    w1 = temperature_weights(counts, alpha)
    w2 = temperature_weights(permuted, alpha)
    assert w1 == w2  # exact float equality, not approx
