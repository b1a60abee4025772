"""Property-based check for the core MinHash-LSH near-dup ladder:
signature (md5-60 mod-P linear hashes), banding (md5 band keys,
array_join's null-skip for empty docs included), candidate pairs, and
exact-Jaccard verification vs a literal Python replay — the third
engine next to the SQL oracle for the most-used dedup operator. The
tiny vocabulary keeps true near-dups, exact dups, disjoint docs, and
empty/NULL docs all in play."""

from __future__ import annotations

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelineetl_spark.operators import dedup
from datapipelineetl_spark.operators.dedup import MINHASH_COEFFS, MINHASH_P


def _hash60(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _ref_pairs(docs, threshold, num_hashes, bands, rows):
    toksets = {
        i: {t for t in re.split("[ \\t\\n\\x0b\\f\\r]+", (s or "").lower())
            if t != ""}
        for i, s in docs
    }
    sigs = {}
    for i, ts in toksets.items():
        hs = [_hash60(t) % MINHASH_P for t in ts]
        sigs[i] = [
            min(((a * h + b) % MINHASH_P for h in hs), default=None)
            for a, b in MINHASH_COEFFS[:num_hashes]
        ]
    buckets: dict[tuple[int, str], set[int]] = {}
    for i, sig in sigs.items():
        for b in range(bands):
            # array_join skips NULL elements — an all-empty slice keys md5("")
            s = ",".join(str(v) for v in sig[b * rows:(b + 1) * rows]
                         if v is not None)
            buckets.setdefault((b, hashlib.md5(s.encode()).hexdigest()),
                               set()).add(i)
    cands = {
        (a, b)
        for members in buckets.values()
        for a in members for b in members if a < b
    }
    out = {}
    for a, b in cands:
        inter = len(toksets[a] & toksets[b])
        union = len(toksets[a] | toksets[b])
        j = inter / max(union, 1)
        j = float(Decimal(repr(j)).quantize(Decimal("1e-6"), ROUND_HALF_UP))
        if j >= threshold:
            out[(a, b)] = j
    return out


_doc = st.lists(
    st.sampled_from(["a", "b", "c", "dup", "fox", "q1"]),
    min_size=0, max_size=10,
).map(" ".join)
_docs = st.lists(st.one_of(st.none(), _doc), min_size=2, max_size=7)


@settings(max_examples=12, deadline=None)
@given(_docs,
       st.sampled_from([0.3, 0.7, 1.0]),
       st.sampled_from([(8, 2, 4), (8, 4, 2), (16, 4, 4)]))
def test_near_dup_pairs_match_python_reference(spark, texts, threshold, shape):
    num_hashes, bands, rows = shape
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.near_dup_pairs(
               df, threshold=threshold, num_hashes=num_hashes,
               bands=bands, rows_per_band=rows).collect()}
    want = _ref_pairs(docs, threshold, num_hashes, bands, rows)
    assert got == want
