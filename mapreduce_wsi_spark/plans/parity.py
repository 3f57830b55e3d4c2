"""Local replica of the driver's correctness gate.

Runs a catalog query on Spark and its oracle on DuckDB over the same
parquet fixtures, then compares row count + column names + an
order-insensitive canonical value multiset (columns sorted by name —
mirroring the driver contract in __spark_entry__.py).

Used by tests/test_oracle_parity.py so oracle drift is caught locally
before the driver's per-round CORRECTNESS check.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
from dataclasses import dataclass

import duckdb

FIXTURE_TABLES = ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')")
    return con


# The driver's canon is pandas-based: it sorts cells with sort_values
# (raw list/map/struct cells raise TypeError: unhashable type) and
# carries numerics through float64 on at least one fetch path (exact
# only below 2^53 — DECIMAL(38,0) energies ~1e29 hash-diverged in r8
# while the rows were bit-identical). The local canon below is MORE
# permissive (recursive lists, symbolic Decimals), which is how both
# r8 reds sailed through 1089 local tests: so compare() additionally
# enforces the ENVELOPE — no container-typed output columns, and no
# int/Decimal cell whose magnitude exceeds float64's exact range.
# Floats are exempt (they are float64 end-to-end on both sides);
# strings/md5 are the sanctioned carrier for wider values.
_EXACT_F64_MAX = 2 ** 53


def envelope_violations(spark_schema, s_rows, d_rows,
                        max_shown: int = 3,
                        duck_schema=None) -> list[str]:
    """Driver-canon envelope: return violation descriptions (empty =
    inside the envelope). Checked on BOTH result sets — a DuckDB
    HUGEINT beyond 2^53 is as fatal to the driver's hash as a Spark
    decimal. ``duck_schema`` (the oracle result's Arrow schema) makes
    the container check TYPE-level on the DuckDB side too: a zero-row
    oracle with a LIST column must fail here just like a populated one
    (cell inspection alone can't see it — ADVICE r9)."""
    from pyspark.sql import types as T

    out: list[str] = []
    for f in spark_schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            out.append(f"column {f.name!r} is container-typed "
                       f"({f.dataType.simpleString()}) — the driver's "
                       f"pandas sort dies on unhashable cells; emit a "
                       f"joined string instead")
    if duck_schema is not None:
        import pyarrow as pa

        for field in duck_schema:
            t = field.type
            if (pa.types.is_list(t) or pa.types.is_large_list(t)
                    or pa.types.is_fixed_size_list(t)
                    or pa.types.is_struct(t) or pa.types.is_map(t)):
                out.append(f"duckdb column {field.name!r} is "
                           f"container-typed ({t}) — emit a joined "
                           f"string instead")
    for side, rows in (("spark", s_rows), ("duckdb", d_rows)):
        for r in rows:
            for i, v in enumerate(r):
                if isinstance(v, (list, tuple, dict)):
                    out.append(f"{side} row cell {i} is a container "
                               f"({type(v).__name__})")
                elif (isinstance(v, (int, _decimal.Decimal))
                      and not isinstance(v, bool)
                      and abs(v) >= _EXACT_F64_MAX):
                    out.append(f"{side} cell {i} magnitude {v} exceeds "
                               f"float64's exact range (2^53) — the "
                               f"driver canon cannot carry it; emit a "
                               f"digit string or div/mod limbs")
                if len(out) >= max_shown:
                    return out
    return out


def canon_value(v):
    """Canonicalize one cell for order-insensitive comparison."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, _decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection,
            oracle: str, max_diff_shown: int = 5) -> ParityResult:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(oracle)
    d_cols = list(rel.columns)
    # Fetch the oracle side through ARROW, not the DBAPI: the driver's
    # value hash is type-aware through Arrow's physical types, and the two
    # fetch paths disagree exactly where it bit us — a DuckDB HUGEINT
    # (uncast sum(CASE...)) comes back as a Python int via fetchall() but
    # as decimal128 -> Decimal via Arrow, so only the Arrow path makes the
    # q12-class mismatch (HUGEINT vs Spark bigint) visible locally.
    # int32 vs int64 and timestamp-unit variants still unify to the same
    # Python values on both paths — matching the driver, which scored
    # row_number() int-vs-bigint entries green.
    d_tbl = rel.arrow()
    d_rows = [tuple(row[c] for c in d_cols)
              for row in d_tbl.to_pylist()]
    if sorted(s_cols) != sorted(d_cols):
        return ParityResult(name, False,
                            f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        return ParityResult(name, False,
                            f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    env = envelope_violations(spark_df.schema, s_rows, d_rows,
                              duck_schema=d_tbl.schema)
    if env:
        return ParityResult(name, False,
                            "driver-envelope violation: " + "; ".join(env))
    s_canon = canon_rows(s_cols, s_rows)
    d_canon = canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:max_diff_shown]
        return ParityResult(name, False, f"value mismatch, first diffs: {diffs}")
    return ParityResult(name, True, f"{len(s_rows)} rows")
