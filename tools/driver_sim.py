#!/usr/bin/env python
"""Driver-gate simulation: run every GATE query through the DRIVER'S OWN
canonicalization path, not a `.count()` shortcut.

Round-9 postmortem (VERDICT r9 #3): the pre-submit sim checked rows>0 via
`.count()`/`.collect()`, which happily succeeds on result sets the real
driver cannot process — the driver canonicalizes EVERY gate row (rows-only
included) by `toPandas()` + an all-column pandas `sort_values`, and pandas
dies with `TypeError: unhashable type: 'list'` on ARRAY/MAP/STRUCT cells.
Three r9 gate slots recorded `spark_rows: None` (zero evidence) because of
exactly this gap. This sim therefore:

  1. runs from whatever cwd it is invoked in (pair with `cd /tmp` to catch
     path/import bugs, as the verify skill prescribes);
  2. fetches each result with `toPandas()` and sorts it over ALL columns —
     the driver's `_canon` shape — so unhashable/unsortable cells crash
     HERE, before a rotation ships them;
  3. reports rows>0 per gate query and exits non-zero on any failure.

Usage: python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def driver_canon_rows(df) -> int:
    """The driver's canonicalization, minimally: Arrow-less toPandas view
    of the full result, sorted over every column. pandas sort_values is
    where list/dict cells explode (unhashable in the comparison path), so
    running it IS the check — the returned count is len() of the SORTED
    frame, never of the raw collect."""
    pdf = df.toPandas()
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return len(pdf)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: full GATE)")
    ap.add_argument("--all", action="store_true",
                    help="sim every registered query, not just the GATE")
    args = ap.parse_args()

    from wireduck_spark.registry import GATE, load_all_queries
    from wireduck_spark.session import get_spark

    queries = load_all_queries()
    if args.only:
        names = [n for n in sorted(set(args.only.split(","))) if n in queries]
    elif args.all:
        names = sorted(queries)
    else:
        names = sorted(GATE)

    spark = get_spark("driver-sim",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    failures = []
    for name in names:
        try:
            n = driver_canon_rows(queries[name].fn(spark, args.sf))
        except Exception:
            print(f"CRASH {name}")
            traceback.print_exc()
            failures.append(name)
            continue
        status = "ok  " if n > 0 else "ZERO"
        if n == 0:
            failures.append(name)
        print(f"{status} {name}: {n} rows")
    print(f"# driver-sim: {len(names) - len(failures)}/{len(names)} "
          f"canonicalize with rows>0"
          + (f"; FAILURES: {sorted(failures)}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
