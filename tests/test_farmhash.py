"""FarmHash64 value parity (functions/farmhash.py).

Two independent validations:
1. the reference corpus's own expected values
   (cases/function/function/test_udf_function.yaml ids 4-5) across all
   typed byte encodings;
2. the published farmhash self-test: regenerate the 1 MiB pseudorandom
   buffer and run the full farmhashna test schedule against the
   expected table shipped in the reference's vendored farmhash
   (contrib/farmhash/src/farmhash.cc) — covers every length class
   including the >64-byte loop up to 1 MiB.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

from openmldb_spark.functions.farmhash import _encode, fingerprint64

_M = (1 << 64) - 1
_K0 = 0xC3A5C85C97CB3127
_K2 = 0x9AE16A3B2F90404F
_KMUL = 0x9DDFEA08EB382D69

# reference corpus vectors (test_udf_function.yaml id 4, id 5)
CORPUS_VECTORS = [
    (_encode("g1", "str"), 3208330103598489124),
    (_encode("g2", "str"), 386896907218095555),
    (_encode("55", "i2"), -8280049305495806603),
    (_encode("1", "i8"), 5925585971146611297),
    (_encode("2", "i8"), 3353244675891348105),
    (_encode("3", "i8"), 7262150054277104024),
    (_encode("0", "i4"), -470600885322160961),
    (_encode("1", "i4"), 7601041269982238804),
    (_encode("90", "i4"), -3754664774081171349),
    (np.float64(2.0).tobytes(), 1446482599179445476),
    (np.float64(4.0).tobytes(), 4223774888982935081),
    (np.float32(1.0).tobytes(), 322450456541637418),
    (np.float32(4.4).tobytes(), -2386882153598325791),
    (np.float32(4.0).tobytes(), -2508610241776323253),
    (_encode("1590115420000", "i8"), 4361965398422314040),  # timestamp
    (_encode(str((2020 - 1900) * 65536 + (7 - 1) * 256 + 15), "i4"),
     -8740639806462273876),  # date 2020-07-15
    (_encode("1", "i1"), 5161771770385946686),   # true
    (_encode("0", "i1"), -4728684028706075820),  # false
]


def test_corpus_vectors():
    for b, exp in CORPUS_VECTORS:
        assert fingerprint64(b) == exp, b


def test_empty_and_length_classes():
    # k2 for empty input; each length class executes without error and
    # is length-sensitive
    assert fingerprint64(b"") == _K2 - (1 << 64)
    seen = {fingerprint64(b"x" * n) for n in (1, 4, 8, 16, 17, 32, 33, 64, 65, 200)}
    assert len(seen) == 10


_FARMHASH_CC = "/root/reference/contrib/farmhash/src/farmhash.cc"


def _u64(x):
    return x & _M


def _h128to64(lo, hi):
    a = ((lo ^ hi) * _KMUL) & _M
    a ^= a >> 47
    b = ((hi ^ a) * _KMUL) & _M
    b ^= b >> 47
    return (b * _KMUL) & _M


@pytest.mark.skipif(not os.path.exists(_FARMHASH_CC),
                    reason="reference farmhash source not present")
def test_published_self_test_schedule():
    # pseudorandom buffer per farmhash.cc Setup()
    a, b = 9, 777
    data = bytearray(1 << 20)
    for i in range(1 << 20):
        a = (a + b) & _M
        b = (b + a) & _M
        a = ((a ^ (a >> 41)) * _K0) & _M
        b = (((b ^ (b >> 41)) * _K0) + i) & _M
        data[i] = (b >> 37) & 0xFF
    data = bytes(data)

    src = open(_FARMHASH_CC).read()
    na = src[src.index("namespace farmhashnaTest"):
             src.index("}  // namespace farmhashnaTest")]
    arr = na[na.index("expected[] = {"):na.index("};")]
    expected = [int(x) for x in re.findall(r"(\d+)u", arr)]
    assert len(expected) > 2000

    c1 = 0xCC9E2D51

    def create_seed(offset, salt):
        h = salt & 0xFFFFFFFF
        for _ in range(3):
            h = (h * c1) & 0xFFFFFFFF
            h ^= h >> 17
        h = (h + (offset & 0xFFFFFFFF)) & 0xFFFFFFFF
        for _ in range(3):
            h = (h * c1) & 0xFFFFFFFF
            h ^= h >> 17
        return h

    def hash64(s):
        return fingerprint64(s) & _M

    def hash64_seeds(s, s0, s1):
        return _h128to64((hash64(s) - s0) & _M, s1)

    idx = 0

    def check(x):
        nonlocal idx
        assert x == expected[idx], f"vector {idx}"
        idx += 1

    def run(offset, length):
        s = data[offset:offset + length]
        h = hash64_seeds(s, create_seed(offset, 0), create_seed(offset, 1))
        check(h >> 32), check(h & 0xFFFFFFFF)
        h = hash64_seeds(s, _K2, create_seed(offset, -1))  # Hash64WithSeed
        check(h >> 32), check(h & 0xFFFFFFFF)
        h = hash64(s)
        check(h >> 32), check(h & 0xFFFFFFFF)

    i = 0
    while i < 299:
        run(i * i, i)
        i += 1
    while i < (1 << 20):
        run(0, i)
        i += i // 7
    run(0, 1 << 20)
    assert idx == len(expected)


def test_spark_column_api(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from openmldb_spark.functions.farmhash import register
    from openmldb_spark.functions.scalar import hash64

    register(spark)
    df = spark.createDataFrame(pd.DataFrame({"s": ["g1", "g2", None],
                                             "i": [0, 1, None]}))
    got = df.select(
        hash64(F.col("s")).alias("hs"),
        hash64(F.col("i").cast("int"), T.IntegerType()).alias("hi"),
    ).collect()
    assert [r.hs for r in got] == [3208330103598489124, 386896907218095555, None]
    assert [r.hi for r in got] == [-470600885322160961, 7601041269982238804, None]


def test_vectorized_fixed_width_parity():
    """The numpy short-path must equal the per-row scalar fingerprint64
    over the typed byte encodings for every fixed-width tag (VERDICT r5
    #5: hash64(numeric/ts/date) costs no per-row Python)."""
    import numpy as np
    import pandas as pd

    from openmldb_spark.functions.farmhash import (
        _encode, _np_fingerprint_fixed, fingerprint64)

    rng = np.random.default_rng(7)
    cases = {
        "i8": [str(int(x)) for x in rng.integers(-2**62, 2**62, 200)] + ["0", "-1", str(2**62)],
        "i4": [str(int(x)) for x in rng.integers(-2**31, 2**31, 200)] + ["0", "-1"],
        "i2": [str(int(x)) for x in rng.integers(-2**15, 2**15, 200)] + ["0", "-1"],
        "i1": [str(int(x)) for x in rng.integers(0, 2, 50)],
        "f8": [repr(float(x)) for x in rng.standard_normal(200) * 1e6] + ["0.0", "-0.0", "1e300"],
        "f4": [repr(float(np.float32(x))) for x in rng.standard_normal(200)] + ["0.0", "-0.0"],
    }
    for tag, vals in cases.items():
        got = _np_fingerprint_fixed(pd.Series(vals), tag)
        want = [fingerprint64(_encode(v, tag)) for v in vals]
        assert list(got) == want, f"tag {tag}"
