"""Cross-engine deterministic hashing.

The reference interns strings via khash (src/igd_base.c:122-145) — a
process-local dictionary. At cluster scale we need a *stateless* hash that is
(a) stable across executors/runs and (b) reproducible by the external oracle
(DuckDB) so correctness gates can hash-compare values. ``xxhash64`` is
JVM-only, so for oracle-checked operators we derive a 60-bit integer from
``md5`` (identical bytes in Spark, DuckDB, and Python's hashlib):

    h60(s) = int(md5(s)[0:15 hex chars], 16)         # < 2^60

Seeded variants use domain separation instead of arithmetic mixing (which
would overflow int64 in SQL): h60_seeded(i, s) = h60(str(i) + '|' + s).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60_col(c: Column | str) -> Column:
    """60-bit md5-derived hash, long. Matches duckdb_h60_sql()."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_seeded_col(seed: int, c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return h60_col(F.concat(F.lit(f"{seed}|"), col))


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def h60_seeded_py(seed: int, s: str) -> int:
    return h60_py(f"{seed}|{s}")


def duckdb_h60_sql(expr: str) -> str:
    """DuckDB SQL fragment computing h60 of a string expression."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def duckdb_h60_seeded_sql(seed: int, expr: str) -> str:
    return duckdb_h60_sql(f"('{seed}|' || {expr})")


# --- driver-side xxhash64 (Spark parity) -----------------------------------
# Spark's F.xxhash64(string) is canonical XXH64 (Yann Collet, public domain
# spec) over the UTF-8 bytes with seed 42. The driver-route positional
# kernels need the SAME term_id for analyzer-removed terms (never in the
# dictionary — search._literal_pos_qdict's literal contract) without a Spark
# job, so here is the 64-bit spec in pure Python. Query terms are few;
# speed is irrelevant. Parity vs F.xxhash64 is pytest-pinned.

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_round(acc: int, val: int) -> int:
    acc = (acc + val * _XXP2) & _M64
    return (_rotl(acc, 31) * _XXP1) & _M64


def _xx_merge(acc: int, val: int) -> int:
    acc ^= _xx_round(0, val)
    return (acc * _XXP1 + _XXP4) & _M64


def xxh64_py(s: str | bytes, seed: int = 42) -> int:
    """XXH64(seed=42) of a string's UTF-8 bytes, as Spark's SIGNED long."""
    data = s.encode("utf-8") if isinstance(s, str) else bytes(s)
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            v1 = _xx_round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _xx_merge(h, v1)
        h = _xx_merge(h, v2)
        h = _xx_merge(h, v3)
        h = _xx_merge(h, v4)
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xx_round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _XXP1) & _M64
        h = (_rotl(h, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
