"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf dir,
compare row count, column names/sorted values (order-insensitive).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon_col(s: pd.Series) -> pd.Series:
    """Canonical string form: unifies int widths / float reprs / dates
    across engines; values are pre-rounded by the queries so exact
    string equality is the contract (mirrors a value-hash)."""
    if pd.api.types.is_datetime64_any_dtype(s.dtype):
        return s.dt.strftime("%Y-%m-%d %H:%M:%S.%f").where(s.notna(), "␀")
    if pd.api.types.is_bool_dtype(s.dtype):
        return s.map(lambda v: str(bool(v))).fillna("␀")
    if pd.api.types.is_numeric_dtype(s.dtype) or str(s.dtype) in ("Int64", "Int32"):
        f = pd.to_numeric(s, errors="coerce").astype("float64")
        return f.map(lambda v: "␀" if pd.isna(v) else repr(round(v, 9) + 0.0))
    return s.astype(object).map(lambda v: "␀" if v is None or v != v else str(v))


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({c: _canon_col(pdf[c]) for c in sorted(pdf.columns)})
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"]
    if len(got) != len(exp):
        errs.append(f"row count {len(got)} vs {len(exp)}")
        return errs
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        bad = g[c].to_numpy() != e[c].to_numpy()
        if bad.any():
            errs.append(
                f"col {c}: {bad.sum()} mismatches, first: got={g[c][bad].head(3).tolist()} exp={e[c][bad].head(3).tolist()}"
            )
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from openmldb_spark.session import SessionConfig, get_spark

    spark = get_spark(SessionConfig(master="local[8]", shuffle_partitions=8, driver_memory="8g"))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures[name] = [f"SPARK ERROR: {ex}"]
            print(f"✗ {name}: spark error {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"· {name}: rows-only, {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            failures[name] = [f"DUCKDB ERROR: {ex}"]
            print(f"✗ {name}: duckdb error {str(ex)[:300]}")
            continue
        errs = compare(name, got, exp)
        if errs:
            failures[name] = errs
            print(f"✗ {name}: " + "; ".join(errs)[:400])
        else:
            print(f"✓ {name}: {len(got)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failing / {len(qs)} total")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
