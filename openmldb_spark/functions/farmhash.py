"""FarmHash64 (Fingerprint64) in pure Python — value parity for the
dialect's ``hash64`` / ``farm_fingerprint``.

The reference computes ``farmhash::Fingerprint64`` over the *raw
little-endian bytes* of the argument (hybridse/src/udf/udf.cc:1407,
udf.h:308 ``Hash64<T>``; byte view per ``literal_traits.h:467`` —
string bytes, int16/32/64 at declared width, float/double IEEE bits,
bool one byte, timestamp the int64 epoch-ms, date the packed int32
``(year-1900)<<16 | (month-1)<<8 | day`` from include/base/type.h:94).

FarmHash is public Google code (MIT); ``Fingerprint64`` is the
portable, forever-fixed ``farmhashna::Hash64``. This is an independent
Python implementation of that published algorithm, validated against
the reference's own corpus vectors
(cases/function/function/test_udf_function.yaml ids 4-5).

Execution shape: an Arrow-batched pandas UDF over a *string-carried*
payload. The carrier is produced JVM-side (CAST ... AS STRING /
unix_millis / year-month-day arithmetic), because Arrow hands nullable
int columns to pandas as float64 — a decimal string survives the pipe
exactly at any width. hash64 is not a hot-path operator; per-row
Python inside one Arrow batch is the honest cost of bit parity with a
C++ hash (the alternative, xxhash64, is native but diverges by value).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

__all__ = ["fingerprint64", "hash64_typed_sql", "register", "UDF_NAME"]

_M = (1 << 64) - 1
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F
_KMUL = 0x9DDFEA08EB382D69

UDF_NAME = "__omldb_hash64__"


def _rot(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & _M if s else v


def _smix(v: int) -> int:
    return v ^ (v >> 47)


def _h16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & _M
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M
    b ^= b >> 47
    return (b * mul) & _M


def _f64(s: bytes, i: int) -> int:
    return int.from_bytes(s[i:i + 8], "little")


def _f32(s: bytes, i: int) -> int:
    return int.from_bytes(s[i:i + 4], "little")


def _len0to16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (_K2 + n * 2) & _M
        a = (_f64(s, 0) + _K2) & _M
        b = _f64(s, n - 8)
        c = ((_rot(b, 37) * mul) + a) & _M
        d = ((_rot(a, 25) + b) * mul) & _M
        return _h16(c, d, mul)
    if n >= 4:
        mul = (_K2 + n * 2) & _M
        a = _f32(s, 0)
        return _h16((n + (a << 3)) & _M, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = a + (b << 8)
        z = n + (c << 2)
        return (_smix(((y * _K2) & _M) ^ ((z * _K0) & _M)) * _K2) & _M
    return _K2


def _len17to32(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M
    a = (_f64(s, 0) * _K1) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    return _h16((_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M,
                (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)


def _len33to64(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M
    a = (_f64(s, 0) * _K2) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    y = (_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M
    z = _h16(y, (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)
    e = (_f64(s, 16) * mul) & _M
    f = _f64(s, 24)
    g = ((y + _f64(s, n - 32)) * mul) & _M
    h = ((z + _f64(s, n - 24)) * mul) & _M
    return _h16((_rot((e + f) & _M, 43) + _rot(g, 30) + h) & _M,
                (e + _rot((f + a) & _M, 18) + g) & _M, mul)


def _weak32(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    w, x, y, z = _f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24)
    a = (a + w) & _M
    b = _rot((b + a + z) & _M, 21)
    c = a
    a = (a + x + y) & _M
    b = (b + _rot(a, 44)) & _M
    return (a + z) & _M, (b + c) & _M


def _hash64_long(s: bytes) -> int:
    n = len(s)
    x = 81
    y = (81 * _K1 + 113) & _M
    z = (_smix((y * _K2 + 113) & _M) * _K2) & _M
    v0 = v1 = w0 = w1 = 0
    x = (x * _K2 + _f64(s, 0)) & _M
    end = ((n - 1) // 64) * 64
    i = 0
    while True:
        x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * _K1) & _M
        y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * _K1) & _M
        x ^= w1
        y = (y + v0 + _f64(s, i + 40)) & _M
        z = (_rot((z + w0) & _M, 33) * _K1) & _M
        v0, v1 = _weak32(s, i, (v1 * _K1) & _M, (x + w0) & _M)
        w0, w1 = _weak32(s, i + 32, (z + w1) & _M, (y + _f64(s, i + 16)) & _M)
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (_K1 + ((z & 0xFF) << 1)) & _M
    i = n - 64
    w0 = (w0 + ((n - 1) & 63)) & _M
    v0 = (v0 + w0) & _M
    w0 = (w0 + v0) & _M
    x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * mul) & _M
    y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * mul) & _M
    x ^= (w1 * 9) & _M
    y = (y + v0 * 9 + _f64(s, i + 40)) & _M
    z = (_rot((z + w0) & _M, 33) * mul) & _M
    v0, v1 = _weak32(s, i, (v1 * mul) & _M, (x + w0) & _M)
    w0, w1 = _weak32(s, i + 32, (z + w1) & _M, (y + _f64(s, i + 16)) & _M)
    z, x = x, z
    return _h16((_h16(v0, w0, mul) + (_smix(y) * _K0) + z) & _M,
                (_h16(v1, w1, mul) + x) & _M, mul)


def fingerprint64(s: bytes) -> int:
    """farmhash::Fingerprint64 of a byte string, as SIGNED int64 (the
    dialect bit-casts the uint64 result — udf.cc:1407)."""
    n = len(s)
    if n <= 16:
        h = _len0to16(s)
    elif n <= 32:
        h = _len17to32(s)
    elif n <= 64:
        h = _len33to64(s)
    else:
        h = _hash64_long(s)
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# typed byte encodings (literal_traits.h to_bytes_ref) + Spark surface
# ---------------------------------------------------------------------------

_WIDTH = {"i1": 1, "i2": 2, "i4": 4, "i8": 8}


def _encode(payload: str, tag: str) -> bytes:
    if tag == "str":
        return payload.encode("utf-8")
    if tag in _WIDTH:
        w = _WIDTH[tag]
        return int(payload).to_bytes(w, "little", signed=True) if tag != "i1" \
            else bytes([int(payload) & 0xFF])
    if tag == "f4":
        return np.float32(payload).tobytes()
    if tag == "f8":
        return np.float64(payload).tobytes()
    raise ValueError(f"unknown hash64 type tag {tag!r}")


# ---------------------------------------------------------------------------
# vectorized fixed-width short path (VERDICT r5 #5): every ≤16-byte
# input hits Fingerprint64's closed-form Len0to16 branch, which for a
# FIXED width w is a single straight-line uint64 expression — numpy
# wraps 64-bit arithmetic exactly like the C++ (C modular semantics),
# so hash64(int/float/bool/ts/date columns) costs no per-row Python.
# Strings keep the per-row path (variable length).
# ---------------------------------------------------------------------------

_NK0 = np.uint64(_K0)
_NK2 = np.uint64(_K2)


def _nrot(v: np.ndarray, s: int) -> np.ndarray:
    return (v >> np.uint64(s)) | (v << np.uint64(64 - s))


def _nh16(u: np.ndarray, v: np.ndarray, mul: np.uint64) -> np.ndarray:
    a = (u ^ v) * mul
    a ^= a >> np.uint64(47)
    b = (v ^ a) * mul
    b ^= b >> np.uint64(47)
    return b * mul


def _np_fingerprint_fixed(vals: pd.Series, tag: str) -> np.ndarray:
    """Vectorized fingerprint64(_encode(v, tag)) for fixed-width tags;
    input: the non-null string payloads; output: int64 hashes."""
    with np.errstate(over="ignore"):
        if tag in ("i8", "f8"):
            if tag == "i8":
                u = vals.astype(np.int64).to_numpy().view(np.uint64)
            else:
                # .astype, not to_numeric: pandas' to_numeric parser can be
                # 1 ulp off Python/numpy float parsing — wrong bits, wrong hash
                u = vals.astype(np.float64).to_numpy().view(np.uint64)
            mul = np.uint64((_K2 + 16) & _M)
            a = u + _NK2
            c = _nrot(u, 37) * mul + a
            d = (_nrot(a, 25) + u) * mul
            return _nh16(c, d, mul).view(np.int64)
        if tag in ("i4", "f4"):
            if tag == "i4":
                u32 = vals.astype(np.int64).to_numpy().astype(np.int32).view(np.uint32)
            else:
                u32 = vals.astype(np.float64).to_numpy().astype(np.float32).view(np.uint32)
            a = u32.astype(np.uint64)
            mul = np.uint64((_K2 + 8) & _M)
            return _nh16(np.uint64(4) + (a << np.uint64(3)), a, mul).view(np.int64)
        if tag == "i2":
            v16 = vals.astype(np.int64).to_numpy().astype(np.int16).view(np.uint16)
            y = v16.astype(np.uint64)  # s[0] + (s[1] << 8) IS the le u16
            hi = (v16 >> np.uint16(8)).astype(np.uint64)
            z = np.uint64(2) + (hi << np.uint64(2))
            h = ((y * _NK2) ^ (z * _NK0))
            h ^= h >> np.uint64(47)
            return (h * _NK2).view(np.int64)
        if tag == "i1":
            b0 = (vals.astype(np.int64).to_numpy()
                  & np.int64(0xFF)).astype(np.uint64)
            y = b0 + (b0 << np.uint64(8))
            z = np.uint64(1) + (b0 << np.uint64(2))
            h = ((y * _NK2) ^ (z * _NK0))
            h ^= h >> np.uint64(47)
            return (h * _NK2).view(np.int64)
    raise ValueError(f"not a fixed-width tag: {tag!r}")


_FIXED_TAGS = frozenset(["i1", "i2", "i4", "i8", "f4", "f8"])


def _make_udf():
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _hash64_udf(payload: pd.Series, tag: pd.Series) -> pd.Series:
        out = pd.Series(np.full(len(payload), None, dtype=object),
                        index=payload.index)
        notna = payload.notna()
        for t in pd.unique(tag[notna]):
            m = notna & (tag == t)
            if t in _FIXED_TAGS:
                out[m] = _np_fingerprint_fixed(payload[m], t)
            else:
                out[m] = [fingerprint64(_encode(p, t)) for p in payload[m]]
        return out

    return _hash64_udf


def register(spark) -> None:
    spark.udf.register(UDF_NAME, _make_udf())


def hash64_typed_sql(src: str, dtype) -> str | None:
    """SQL text for hash64(src) given the probed Spark type of ``src``:
    a JVM-side exact string carrier + a width/kind tag into the pandas
    UDF. Returns None for unsupported types."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.StringType):
        return f"{UDF_NAME}(({src}), 'str')"
    if isinstance(dtype, T.BooleanType):
        return f"{UDF_NAME}(CAST(CAST(({src}) AS INT) AS STRING), 'i1')"
    if isinstance(dtype, T.ShortType):
        return f"{UDF_NAME}(CAST(({src}) AS STRING), 'i2')"
    if isinstance(dtype, T.IntegerType):
        return f"{UDF_NAME}(CAST(({src}) AS STRING), 'i4')"
    if isinstance(dtype, T.LongType):
        return f"{UDF_NAME}(CAST(({src}) AS STRING), 'i8')"
    if isinstance(dtype, T.FloatType):
        # Float/Double.toString is the shortest repr that roundtrips
        # to the same value — the bits survive the string carrier
        return f"{UDF_NAME}(CAST(({src}) AS STRING), 'f4')"
    if isinstance(dtype, T.DoubleType):
        return f"{UDF_NAME}(CAST(({src}) AS STRING), 'f8')"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return f"{UDF_NAME}(CAST(unix_millis({src}) AS STRING), 'i8')"
    if isinstance(dtype, T.DateType):
        # packed int32: (year-1900)<<16 | (month-1)<<8 | day
        return (f"{UDF_NAME}(CAST((year({src}) - 1900) * 65536 "
                f"+ (month({src}) - 1) * 256 + day({src}) AS STRING), 'i4')")
    return None
