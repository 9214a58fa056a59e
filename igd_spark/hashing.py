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
