"""Property-based check for the Gopher rule battery: every flag on
randomized text soups must match a pure-Python reference that mirrors
the operator's integer inequalities literally — the third engine next
to the Spark expression tree and the DuckDB oracle. The strategy
generates the battery's own trigger characters (bullets, hashes, both
ellipsis forms, CRLF lineage) so the branch space is actually walked,
not just the happy path."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import text as text_ops

_JAVA_WS = "[ \\t\\n\\x0b\\f\\r]+"  # Java regex \s (ASCII), not Python's unicode \s
_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _ref_gopher(s, min_words=50, max_words=100_000, stopwords=_STOPWORDS):
    txt = (s or "").lower()
    toks = [t for t in re.split(_JAVA_WS, txt) if t != ""]
    n_words = len(toks)
    sum_len = sum(len(t) for t in toks)
    raw = s or ""
    n_hash = raw.count("#")
    n_uni_ell = raw.count("…")
    n_dot_ell = (len(raw) - len(raw.replace("...", ""))) // 3
    n_symbols = n_hash + n_uni_ell + n_dot_ell
    lines = [ln for ln in raw.split("\n") if ln.strip(" \t\r") != ""]
    n_lines = len(lines)
    n_bullet = sum(
        1 for ln in lines if ln.strip(" \t\r")[:1] in ("-", "*", "•")
    )
    n_ell = sum(
        1 for ln in lines
        if ln.strip(" \t\r").endswith("...") or ln.strip(" \t\r").endswith("…")
    )
    n_alpha = sum(1 for t in toks if re.search("[a-z]", t))
    n_stop = len(set(toks) & set(stopwords))
    flags = {
        "r_word_count": min_words <= n_words <= max_words,
        "r_mean_word_len": n_words > 0
        and 3 * n_words <= sum_len <= 10 * n_words,
        "r_symbol_ratio": 10 * n_symbols <= n_words,
        "r_bullet_lines": 10 * n_bullet <= 9 * n_lines,
        "r_ellipsis_lines": 10 * n_ell <= 3 * n_lines,
        "r_alpha_words": 5 * n_alpha >= 4 * n_words,
        "r_stopwords": n_stop >= 2,
    }
    out = {k: int(v) for k, v in flags.items()}
    out["n_words"] = n_words
    out["kept"] = int(all(flags.values()))
    return out


_piece = st.sampled_from(
    list(_STOPWORDS)
    + ["fox", "a", "supercalifragilistic", "42", "#", "##", "...", "…",
       "- bullet", "* item", "• dot", "trails...", "ends…", "\r", "\t"]
)
_sep = st.sampled_from([" ", "  ", "\n", "\r\n", " \n "])
_texts = st.lists(
    st.one_of(
        st.none(),
        st.tuples(
            st.lists(_piece, min_size=0, max_size=120),
            st.lists(_sep, min_size=0, max_size=120),
        ),
    ),
    min_size=1,
    max_size=8,
)


def _weave(parts):
    pieces, seps = parts
    out = []
    for i, p in enumerate(pieces):
        out.append(p)
        out.append(seps[i % len(seps)] if seps else " ")
    return "".join(out)


@settings(max_examples=15, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=60))
def test_gopher_rules_match_python_reference(spark, raw_docs, min_words):
    docs = [
        (i, _weave(parts) if parts is not None else None)
        for i, parts in enumerate(raw_docs)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict()
        for r in text_ops.gopher_rules(df, min_words=min_words).collect()
    }
    for i, s in docs:
        want = _ref_gopher(s, min_words=min_words)
        have = {k: got[i][k] for k in want}
        assert have == want, f"doc {i} text={s!r}"
