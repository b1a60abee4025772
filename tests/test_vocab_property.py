"""Property-based check for the text→tensor boundary: build_vocab's
dense ranking (count desc, token asc tiebreak; specials first;
min_count/max_size pruning) and encode_tokens' id streams (original
order, unk fallback, empty/NULL docs → empty arrays, never dropped)
vs a literal Python replay on randomized small-vocabulary corpora —
the digest-checked oracle pins fixture behavior, this walks the
pruning/tie edge cases the fixture never varies."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import text as text_ops

_SPECIALS = ("<pad>", "<unk>")


def _toks(s):
    return [t for t in re.split("[ \\t\\n\\x0b\\f\\r]+", (s or "").lower())
            if t != ""]


def _ref_vocab(docs, min_count, max_size):
    counts = Counter(t for _, s in docs for t in _toks(s)
                     if t not in _SPECIALS)
    kept = sorted(
        ((t, c) for t, c in counts.items() if c >= min_count),
        key=lambda tc: (-tc[1], tc[0]),
    )
    vocab = {t: i for i, t in enumerate(_SPECIALS)}
    rows = {t: (i, 0) for t, i in vocab.items()}
    for r, (t, c) in enumerate(kept):
        tid = r + len(_SPECIALS)
        rows[t] = (tid, c)
    if max_size is not None:
        rows = {t: (i, c) for t, (i, c) in rows.items() if i < max_size}
    return rows


def _ref_encode(docs, vocab_rows):
    ids = {t: i for t, (i, _) in vocab_rows.items()}
    unk = ids["<unk>"]
    return {i: [ids.get(t, unk) for t in _toks(s)] for i, s in docs}


_doc = st.lists(
    st.sampled_from(["a", "b", "cc", "dup", "fox", "<unk>"]),
    min_size=0, max_size=12,
).map(" ".join)
_docs = st.lists(st.one_of(st.none(), _doc), min_size=1, max_size=6)


@settings(max_examples=12, deadline=None)
@given(_docs,
       st.integers(min_value=1, max_value=3),
       st.one_of(st.none(), st.integers(min_value=2, max_value=8)))
def test_vocab_and_encode_match_python_reference(spark, texts, min_count,
                                                 max_size):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vocab = text_ops.build_vocab(df, min_count=min_count, max_size=max_size)
    # r["count"], not r.count — the column name shadows Row.count()
    got_vocab = {r.token: (r.token_id, r["count"]) for r in vocab.collect()}
    want_vocab = _ref_vocab(docs, min_count, max_size)
    assert got_vocab == want_vocab

    if "<unk>" not in got_vocab:
        return  # max_size=... <2 never happens; unk always survives
    got_ids = {r.doc_id: list(r.input_ids)
               for r in text_ops.encode_tokens(df, vocab).collect()}
    assert got_ids == _ref_encode(docs, want_vocab)
    assert set(got_ids) == {i for i, _ in docs}  # no dropped rows
