"""Data-layout optimization for 100 TB parquet stores: Z-order writes.

Partitioning prunes on ONE column hierarchy; Z-ordering makes file- and
row-group-level min/max statistics selective on SEVERAL columns at once:
rows are sorted by the bit-interleaving of the columns' rank codes, so
each written file covers a small hyper-rectangle of the value space and a
predicate on ANY of the z-columns skips most files (parquet readers prune
row groups whose min/max exclude the filter; engines with file-level
stats — or a manifest built from ``pyarrow`` footer metadata — skip whole
files). This is the same design as Delta/Iceberg OPTIMIZE ZORDER BY,
expressed as a plain write-time transform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZBITS = 16  # code resolution per column; 2 cols × 16 bits → 32-bit z-value


def z_value(code_cols: Sequence[Column]) -> Column:
    """Bit-interleave per-column integer codes (each in [0, 2^16)) into
    one Z/Morton value — the space-filling-curve key. Pure integer
    shift/mask expressions: codegen, no UDF."""
    z: Column = F.lit(0).cast("long")
    n = len(code_cols)
    for c_idx, col in enumerate(code_cols):
        for bit in range(_ZBITS):
            z = z + (
                F.shiftleft(
                    F.shiftright(col.cast("long"), bit).bitwiseAND(F.lit(1)),
                    bit * n + c_idx,
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on ``cols``:
    each (numeric) column is code-mapped to 16 bits by linear min/max
    scaling, codes interleave into a z-value, and a range-repartition +
    in-partition sort on it clusters each output file on a hyper-
    rectangle of the value space.

    Scale: ONE metadata aggregate for the per-column min/max (driver
    scalars), narrow code/interleave expressions, then ONE range shuffle
    for the write — deliberately NOT a ``percent_rank`` global window,
    which would serialize the whole table through one task (the repo's
    own global-ORDER-BY rule). Linear coding is skew-sensitive: a
    heavily skewed column crowds its code space and weakens skipping on
    that axis; for such columns pre-map through a quantile lookup
    (``approx_percentile`` boundaries on a sample) and z-order the
    mapped column. The payoff is on the READ side forever after: min/max
    stats per file/row-group become selective on every z-column
    (``tests/test_layout.py`` measures it from the actual parquet
    footers).
    """
    if not cols or len(cols) > 3:
        raise ValueError(f"z-order 1–3 columns, got {list(cols)}")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).first()
    codes = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None:
            raise ValueError(f"z-order column {c!r} is all-null")
        span = (mx - mn) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
        codes.append(
            F.least(
                F.floor(scaled * (1 << _ZBITS)).cast("long"),
                F.lit((1 << _ZBITS) - 1),
            )
        )
    zed = df.withColumn("__z", z_value(codes))
    (
        zed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from the parquet footers (pyarrow) —
    the manifest a file-skipping reader would consult. Returns one dict
    per data file: {file, col: (min, max), ...}."""
    from pathlib import Path as _P

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_P(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        stats: dict = {"file": f.name}
        for c in cols:
            mn, mx = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == c and col.statistics is not None:
                        s = col.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            stats[c] = (mn, mx)
        out.append(stats)
    return out


def quantile_code(
    df: DataFrame,
    col: str,
    out: str | None = None,
    bits: int = 8,
    relative_error: float = 0.001,
) -> DataFrame:
    """The skew escape hatch for ``zorder_write``: map ``col`` to a
    [0, 2^bits) code by its approximate quantile bucket, so a heavily
    skewed column spreads UNIFORMLY over the code space (equal-frequency
    instead of equal-width coding). Z-order the coded column:

        df2 = quantile_code(df, "user_id", "user_code")
        zorder_write(df2, path, ["ts_day", "user_code"])

    Scale: one ``approx_percentile`` aggregate (GK sketch, driver gets
    2^bits boundary scalars — metadata), then the code is a narrow
    binary-search expression over the boundary array literal
    (``array_position`` on a sorted literal; O(2^bits) comparisons in
    codegen, fine for bits ≤ 10). No window, no shuffle.
    """
    if not 1 <= bits <= 10:
        raise ValueError(f"bits must be in [1, 10], got {bits}")
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    row = df.agg(
        F.expr(
            f"approx_percentile({col}, array({', '.join(str(q) for q in qs)}), "
            f"{int(1 / relative_error)})"
        ).alias("b")
    ).first()
    if row.b is None:
        raise ValueError(f"quantile_code column {col!r} is all-null")
    bounds = sorted(set(row.b))  # duplicates collapse on low-cardinality cols
    code = F.lit(0)
    for b in bounds:
        code = code + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
    return df.withColumn(out or f"{col}_qcode", code.cast("long"))
