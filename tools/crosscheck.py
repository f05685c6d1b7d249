"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry in Spark AND its ``oracle_sql()`` in DuckDB on the
same parquet tables, compare row count, column names, and
order-insensitive values.

Usage: python tools/crosscheck.py [sf_dir] [query ...]

Set CROSSCHECK_OUT=<path.json> to also write a machine-readable artifact
(one record per query: status, rows, dtype drift) — committed per round
as CROSSCHECK_r{N}.json so the tail queries' green state is reproducible
alongside the driver's CORRECTNESS_r{N}.json (ADVICE r4 #5).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from polars_sim_spark.session import get_spark
from polars_sim_spark.sources.tables import TABLES


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_to_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-keyed sort: NULLs (None) don't order against ints/strs in
    # Python 3; repr gives a total, deterministic order that is
    # identical for identical canon rows on both engines.
    return sorted(
        (tuple(canon(r[i]) for i in idx) for r in rows), key=repr
    )


def _canon_dtype(t: str) -> str:
    """Canonical dtype class from the type name's leading token — exact
    base-name match, not substring containment (substring matching
    classified e.g. 'interval' as int and 'datetime' as date)."""
    t = t.lower().strip()
    if t.endswith("[]"):
        return "list"
    # leading identifier: 'decimal(18,6)' -> 'decimal', 'array<long>' -> 'array'
    base = ""
    for ch in t:
        if ch.isalnum() or ch == "_":
            base += ch
        else:
            break
    classes = {
        "int": ("tinyint", "smallint", "int", "bigint", "long", "integer",
                "hugeint", "utinyint", "usmallint", "uinteger", "ubigint",
                "int8", "int16", "int32", "int64", "uint8", "uint16",
                "uint32", "uint64", "short", "byte"),
        "float": ("float", "double", "real", "float32", "float64"),
        "dec": ("decimal", "numeric"),
        "str": ("string", "varchar", "char", "text"),
        "bool": ("boolean", "bool"),
        "ts": ("timestamp", "datetime", "timestamp_ns", "timestamp_ms",
               "timestamp_s", "timestamptz"),
        "date": ("date", "date32", "date64"),
        "bin": ("binary", "blob", "bytea", "varbinary"),
        "list": ("array", "list"),
    }
    for cls, names in classes.items():
        if base in names:
            return cls
    return t


def dtype_drift(sdf, dcols, dtypes):
    """Advisory dtype comparison by canonical class (int/float/dec/str/
    bool/ts/date/bin/list); returns [(col, spark_type, duck_type)] for
    columns whose classes disagree."""
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out = []
    for col, dt in zip(dcols, dtypes):
        st = stypes.get(col)
        if st is not None and _canon_dtype(st) != _canon_dtype(str(dt)):
            out.append((col, st, str(dt)))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("crosscheck")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}

    def rec(name, status, rows=None, detail=None, drift=None):
        record[name] = {
            "status": status,
            "rows": rows,
            "detail": detail,
            "dtype_drift": [list(d) for d in drift] if drift else None,
        }
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            rec(name, "fail", detail=f"spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {len(srows)} rows (no oracle)")
            rec(name, "rows_only", rows=len(srows))
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            rec(name, "fail", detail=f"duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            rec(name, "fail", detail=f"columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            rec(name, "fail", detail=f"rowcount spark={len(srows)} duck={len(drows)}")
            failures.append(name)
            continue
        sc = rows_to_canon(scols, srows)
        dc = rows_to_canon(dcols, drows)
        if sc != dc:
            bad = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            rec(name, "fail", rows=len(srows), detail=f"value mismatch: {bad}")
            failures.append(name)
            continue
        drift = dtype_drift(sdf, dcols, dtypes)
        if drift:
            # advisory only: canonical values already matched, but the
            # driver's schema compare may be stricter than value hashing
            print(f"PASS {name}: {len(srows)} rows (dtype drift: {drift})")
            rec(name, "pass", rows=len(srows), drift=drift)
        else:
            print(f"PASS {name}: {len(srows)} rows")
            rec(name, "pass", rows=len(srows))

    out = os.environ.get("CROSSCHECK_OUT")
    if out:
        import json

        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": record}, fh, indent=1)
            fh.write("\n")
        print(f"wrote {out} ({len(record)} records)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
