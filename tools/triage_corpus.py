"""Triage a reference YAML case file: run every case through the
harness and print pass/fail/skip per id (no pytest overhead).

Usage: python tools/triage_corpus.py FILE [FILE...]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from tests.reference_cases import load_cases, run_case  # noqa: E402


def main(paths: list[str]) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("FATAL")
    for path in paths:
        print(f"\n=== {path}")
        ok = fail = skip = 0
        for case in load_cases(path):
            try:
                res, msg = run_case(spark, case)
            except Exception as ex:  # noqa: BLE001
                res, msg = False, f"HARNESS ERROR: {type(ex).__name__}: {ex}"
            cid = str(case.get("id"))
            desc = str(case.get("desc"))[:60]
            if res is None:
                skip += 1
                print(f"  SKIP {cid:>10} {desc} | {msg}")
            elif res:
                ok += 1
                print(f"  ok   {cid:>10} {desc}")
            else:
                fail += 1
                print(f"  FAIL {cid:>10} {desc} | {msg[:300]}")
        print(f"  --- ok={ok} fail={fail} skip={skip}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
