"""Probe runner: execute reference YAML case files through the SQL
engine and print a per-file pass/fail/skip summary (first N failure
messages each). Used to triage new corpus directories before wiring
them into tests/test_reference_cases.py.

Usage: python tools/probe_corpus.py FILE_OR_GLOB [...]
"""

from __future__ import annotations

import glob
import sys

sys.path.insert(0, "/root/repo")

from tests.reference_cases import load_cases, run_case  # noqa: E402
from openmldb_spark.session import get_spark  # noqa: E402

SMOKE_FILES = {
    "test_ads.yaml", "test_credit.yaml", "test_fqz_studio.yaml",
    "test_jd.yaml", "test_news.yaml", "long_window.yaml",
}


def main() -> None:
    paths: list[str] = []
    for a in sys.argv[1:]:
        paths.extend(sorted(glob.glob(a)))
    spark = get_spark()
    grand_ok = grand_fail = grand_skip = 0
    for path in paths:
        fname = path.rsplit("/", 1)[-1]
        ok = skip = 0
        fails: list[str] = []
        try:
            cases = load_cases(path)
        except Exception as ex:  # noqa: BLE001
            print(f"{path}: LOAD ERROR {ex}", flush=True)
            continue
        for case in cases:
            try:
                r, msg = run_case(spark, case,
                                  smoke_success=fname in SMOKE_FILES)
            except Exception as ex:  # noqa: BLE001
                r, msg = False, f"HARNESS ERROR {type(ex).__name__}: {ex}"
            if r is True:
                ok += 1
            elif r is None:
                skip += 1
            else:
                fails.append(f"  id={case.get('id')} "
                             f"{str(case.get('desc'))[:40]}: {msg[:220]}")
        grand_ok += ok
        grand_fail += len(fails)
        grand_skip += skip
        tag = "PASS" if not fails else "FAIL"
        print(f"{tag} {path}: ok={ok} fail={len(fails)} skip={skip}",
              flush=True)
        for f in fails[:8]:
            print(f, flush=True)
    print(f"TOTAL ok={grand_ok} fail={grand_fail} skip={grand_skip}",
          flush=True)


if __name__ == "__main__":
    main()
