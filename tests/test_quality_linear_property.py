"""Property-based check for the hashed linear quality scorer: the
whole scoring path — md5 60-bit token hash, bucket modulo, integer
milli-weight sum (default Knuth-derived weights AND a trained-weights
array literal), bias, the one float division + sigmoid, HALF_UP
rounding — against a literal Python replay. The milli-unit design's
point is exactly that this comparison is deterministic: the
accumulation is an exact BIGINT sum, float enters once at the end."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import text as text_ops


def _hash60(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _ref_quality(s, n_buckets, weights_milli, bias_milli):
    toks = [t for t in re.split("[ \\t\\n\\x0b\\f\\r]+", (s or "").lower())
            if t != ""]
    if not toks:
        return (0, None)
    total = 0
    for t in toks:
        b = _hash60(t) % n_buckets
        if weights_milli is None:
            total += (b * 2654435761) % 2001 - 1000
        else:
            total += weights_milli.get(b, 0)
    score = (total + bias_milli) / (1000.0 * len(toks))
    prob = 1.0 / (1.0 + math.exp(-score))
    return (
        len(toks),
        float(Decimal(repr(prob)).quantize(Decimal("1e-5"), ROUND_HALF_UP)),
    )


_words = st.lists(
    st.text(alphabet="abcdef#…é", min_size=1, max_size=6),
    min_size=0,
    max_size=40,
)
_docs = st.lists(st.one_of(st.none(), _words), min_size=1, max_size=6)


@settings(max_examples=12, deadline=None)
@given(
    _docs,
    st.integers(min_value=1, max_value=64),
    st.one_of(
        st.none(),
        st.dictionaries(
            st.integers(min_value=0, max_value=63),
            st.integers(min_value=-1000, max_value=1000),
            max_size=16,
        ),
    ),
    st.integers(min_value=-500, max_value=500),
)
def test_quality_linear_matches_python_reference(
    spark, raw_docs, n_buckets, weights, bias
):
    if weights is not None:
        weights = {b: w for b, w in weights.items() if b < n_buckets}
    docs = [
        (i, " ".join(ws) if ws is not None else None)
        for i, ws in enumerate(raw_docs)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.quality_prob)
        for r in text_ops.quality_linear(
            df, n_buckets=n_buckets, weights_milli=weights,
            bias_milli=bias,
        ).collect()
    }
    for i, s in docs:
        assert got[i] == _ref_quality(s, n_buckets, weights, bias), (
            f"doc {i} text={s!r}"
        )
