"""Property-based check for the SimHash fingerprint: the per-bit
majority vote over distinct-token md5 hashes is pure integer math, so
a literal Python replay must match BIT FOR BIT on randomized text —
including the tie rule (a bit is set iff ones-count*2 > total, so an
exact tie leaves it clear) and the empty/NULL-text degenerate (all
counts 0 → signature 0)."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import text as text_ops


def _hash60(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _ref_simhash(s, bits=32):
    toks = sorted(
        {t for t in re.split("[ \\t\\n\\x0b\\f\\r]+", (s or "").lower())
         if t != ""}
    )
    total = len(toks)
    sig = 0
    for b in range(bits):
        ones = sum((_hash60(t) >> b) & 1 for t in toks)
        if ones * 2 > total:
            sig |= 1 << b
    return sig


_texts = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.text(alphabet="abcdxyz0…#", min_size=1, max_size=5),
            min_size=0,
            max_size=30,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(_texts)
def test_simhash_matches_python_reference(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in text_ops.with_simhash(df).collect()}
    for i, s in docs:
        assert got[i] == _ref_simhash(s), f"doc {i} text={s!r}"
