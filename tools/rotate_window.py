"""Compute the next round's PRIORITY window (the perennial round-start
task — VERDICT item 1 in rounds 4 and 5).

Reads the newest CORRECTNESS_r*.json records, derives which registered
queries' freshest green row is about to age past its tier's horizon
(round-9 tiering policy, VERDICT r8 item 2: CORE queries re-verify
every 3 records, EXTENSION-tier queries — ``__spark_entry__.
EXTENSION_TIER``, the promoted staged batteries — every 5), folds in
any staged promotions, and prints a suggested 50-slot window. Purely
advisory — paste the result into ``__spark_entry__.PRIORITY`` and let
``tests/test_schemas.py::test_driver_check_window_contract`` be the
gate of record.

    python tools/rotate_window.py [n_promote_staged]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def _staged_batches() -> dict:
    """Every ``queries_batch*`` module's STAGED dicts, pkgutil-discovered
    (the check_correctness r12 fix applied here too: a hand-kept import
    list silently skips the newest batch — which is exactly the batch
    whose promotion this tool exists to schedule)."""
    import importlib
    import pkgutil

    import datapipelineetl_spark as _pkg

    queries: dict = {}
    oracles: dict = {}
    for info in sorted(
        pkgutil.iter_modules(_pkg.__path__), key=lambda i: i.name
    ):
        if not info.name.startswith("queries_batch"):
            continue
        mod = importlib.import_module(f"datapipelineetl_spark.{info.name}")
        queries.update(getattr(mod, "STAGED_QUERIES", {}))
        oracles.update(getattr(mod, "STAGED_ORACLES", {}))
    return queries


WINDOW = 50


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_promote = int(args[0]) if args else None
    repo = Path(entrymod.__file__).resolve().parent
    recent = sorted(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )[-4:]

    def greens(path):
        rec = json.loads(path.read_text())
        return rec, {
            n
            for n, row in rec.items()
            if row.get("hash_match")
            or (row.get("rows_match") and "hash_match" not in row)
        }

    rec, latest_green = greens(recent[-1])
    # tier arithmetic (contract-test twin): a query is ABOUT TO age out
    # when it is green in none of the newest (horizon - 1) records —
    # core horizon 3 → 2 records, extension horizon 5 → 4 records.
    green_by_n: dict[int, set] = {}
    for n in (2, 4):
        g = set()
        for p in recent[-n:]:
            g |= greens(p)[1]
        green_by_n[n] = g
    registered = list(entrymod.queries())

    def horizon_records(q):
        return 4 if q in entrymod.EXTENSION_TIER else 2

    aged = [q for q in registered if q not in green_by_n[horizon_records(q)]]
    red = [q for q in rec if q in registered and q not in latest_green]
    all_staged = _staged_batches()
    staged = [q for q in all_staged if q not in registered]
    n_core = sum(1 for q in registered if q not in entrymod.EXTENSION_TIER)
    print(
        f"latest records: {[p.name for p in recent]} "
        f"(core green in newest 2: "
        f"{len(green_by_n[2])}, extension green in newest 4: "
        f"{len(green_by_n[4])})"
    )
    print(
        f"registered    : {len(registered)} "
        f"({n_core} core / {len(registered) - n_core} extension)"
    )
    print(f"aging out     : {len(aged)} (must re-verify this round)")
    if red:
        print(f"RED last round: {red} (must be in the window)")
    print(f"staged backlog: {len(staged)} ({', '.join(staged)})")
    free = WINDOW - len(aged)
    print(f"free slots    : {free} of {WINDOW}")
    forced_red = [q for q in red if q not in aged]
    forced = len(aged) + len(forced_red)
    take = min(len(staged), max(WINDOW - forced, 0)) if n_promote is None else n_promote
    if forced + take > WINDOW:
        print(
            f"WARNING: {len(aged)} aged + {len(forced_red)} red + {take} "
            f"promotions > {WINDOW} — stagger promotions or relax the "
            "contract (see NOTES.md rotation checklist)"
        )
        take = max(0, WINDOW - forced)
    window = forced_red + staged[:take] + aged
    window = window[:WINDOW]
    # fill the free slots oldest-newest-green-record first (VERDICT r6
    # item 2's policy): a query whose freshest green row is about to age
    # out beats one re-verified last round — refreshing it now avoids
    # its forced slot next round. Tie-break by registration order.
    all_records = sorted(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    newest_green: dict[str, int] = {}
    for i, p in enumerate(all_records):
        for q in greens(p)[1]:
            newest_green[q] = i
    pad = sorted(
        (q for q in registered if q not in window),
        key=lambda q: (newest_green.get(q, -1), registered.index(q)),
    )
    while len(window) < WINDOW and pad:
        window.append(pad.pop(0))
    print(f"\nsuggested PRIORITY ({len(window)} slots; promotions first):")
    for q in window:
        print(f'    "{q}",')
    # driver-hashability guard (VERDICT r7 item 2): a query whose output
    # schema the driver's pandas canon cannot hash must never take a
    # window slot — build each candidate lazily (schema analysis only,
    # nothing executes) and fail loudly on array/map/struct columns.
    if "--no-schema-check" not in sys.argv[1:]:
        from datapipelineetl_spark.queries import driver_unsafe_cols
        from datapipelineetl_spark.session import get_session

        spark = get_session("rotate-window-schema-check")
        all_q = {**entrymod.queries(), **all_staged}
        sf_dir = "/root/testdata/sf0.001"
        unsafe = {}
        for q in window:
            cols = driver_unsafe_cols(all_q[q](spark, sf_dir).schema)
            if cols:
                unsafe[q] = cols
        if unsafe:
            print(
                f"\nERROR: driver-unhashable output columns in the window: "
                f"{unsafe} — md5-digest the collection or posexplode to "
                "scalar rows before giving these queries slots"
            )
            return 1
        print("\nschema check: all window outputs driver-hashable")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
