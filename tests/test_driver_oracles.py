"""Local replica of the driver's Spark-vs-DuckDB correctness gate for
the four queries that were rows-only (`no_oracle`) through round 3:
minhash_pairs, simhash_pairs, lsh_topk, backfill_transcripts
(VERDICT r3 "What's missing" #1).

Runs each __spark_entry__ query at sf0.01 (the driver's gate scale)
and compares full sorted value tuples against its oracle_sql() — the
same columns-sorted-by-name convention the driver hashes."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _null_safe(t):
    return tuple((v is None, v) for v in t)


@pytest.mark.parametrize(
    "name", ["minhash_pairs", "simhash_pairs", "lsh_topk",
             "backfill_transcripts", "request_transcripts"]
)
def test_oracle_matches(spark, duck, name):
    df = entry.queries()[name](spark, SF_DIR)
    cols = sorted(df.columns)
    got = sorted(
        [tuple(r[c] for c in cols) for r in df.collect()], key=_null_safe
    )
    res = duck.sql(entry.oracle_sql()[name])
    assert sorted(res.columns) == cols
    idx = [res.columns.index(c) for c in cols]
    want = sorted(
        [tuple(r[i] for i in idx) for r in res.fetchall()], key=_null_safe
    )
    assert len(got) == len(want) and len(got) > 0
    assert got == want
