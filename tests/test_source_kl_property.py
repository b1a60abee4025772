"""Property check for ``source_kl``'s exact-count identity (VERDICT
r11 item 7b): on randomized multi-source corpora the Spark fold —
KL = (S_in - S_cross)/n_g + ln T - ln n_g over exact BIGINT counts —
must agree with a pure-Python KL computed directly from the same
counts, Σ p ln(p/q).

Unlike the bit-for-bit sketch/simhash properties, the comparison here
is ONE-ROUNDING-QUANTUM (|got - round(expect, 6)| <= 1e-6), by design:
the Spark side sums its float folds in shuffle order while the Python
side sums sequentially, and the identity form and the direct form
associate the same additions differently — NOTES.md records this as
the reason source_kl has no exact replay. The quantum bound still pins
everything structural: the exact counts, the support (which groups
appear), and the identity itself (a wrong count or a dropped token
shifts KL by far more than 1e-6 on these tiny corpora)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import text

_word = st.sampled_from(
    ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]
)
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_src = st.sampled_from(["web", "books", "crawl"])
_corpus = st.lists(st.tuples(_src, _doc), min_size=1, max_size=14).filter(
    lambda rows: any(t.strip() for _, t in rows)
)


def _py_kl(rows):
    counts: dict = {}
    corpus: dict = {}
    for src, doc in rows:
        for tok in doc.lower().split():
            if not tok:
                continue
            counts.setdefault(src, {})
            counts[src][tok] = counts[src].get(tok, 0) + 1
            corpus[tok] = corpus.get(tok, 0) + 1
    total = sum(corpus.values())
    out = {}
    for src, cgt in counts.items():
        n_g = sum(cgt.values())
        kl = sum(
            (c / n_g) * math.log((c / n_g) / (corpus[t] / total))
            for t, c in cgt.items()
        )
        out[src] = (n_g, kl)
    return out


@settings(max_examples=10, deadline=None)
@given(_corpus)
def test_source_kl_matches_python_identity(spark, rows):
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {
        r.source: (r.n_tokens, r.kl_divergence)
        for r in text.source_kl(df).collect()
    }
    expect = _py_kl(rows)
    assert set(got) == set(expect)          # token-empty groups absent
    for src, (n_g, kl) in expect.items():
        assert got[src][0] == n_g           # exact BIGINT token totals
        assert abs(got[src][1] - round(kl, 6)) <= 1e-6
        assert got[src][1] >= -1e-6         # KL is non-negative
