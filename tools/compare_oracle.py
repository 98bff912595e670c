"""Local mimic of the driver's correctness gate: run every registry
query on Spark and its oracle on DuckDB over the same parquet dir,
compare row count, column names, and order-insensitive value hash.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NaN"
            if v == int(v) and abs(v) < 1e15:
                return repr(float(v))
            return repr(v)
        if isinstance(v, bool):
            return str(v)
        return str(v)

    lines = sorted("|".join(cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def fragile_cells(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Hostile-rendering guard (round-4 lesson, q237/q279): any exact
    integer-typed value (int or Decimal) that does NOT survive a
    float64 round-trip would render differently under a renderer that
    routes numbers through float64 (drops bits above 2^53) — exactly
    how the driver's canonicalization broke two symmetric-decimal
    queries that this module's canon() accepted locally. Returns
    (col, value) pairs whose exact rendering the repo cannot rely on;
    any hit means that column must be emitted as a digit STRING on
    both engines."""
    import decimal

    out = []
    for r in rows:
        for c, v in zip(cols, r):
            if isinstance(v, bool) or v is None:
                continue
            if isinstance(v, (int, decimal.Decimal)):
                try:
                    if int(float(v)) != int(v):
                        out.append((c, v))
                except (OverflowError, ValueError, decimal.InvalidOperation):
                    out.append((c, v))
    return out


def complex_output_columns(schema) -> list[str]:
    """Driver-canonicalizability contract (round-8 lesson, q129): the
    driver canonicalizes results by sorting a pandas frame, and pandas
    cannot hash/factorize list- or dict-valued cells — an ARRAY / MAP /
    STRUCT top-level output column errors the whole CORRECTNESS row
    (`TypeError: unhashable type: 'list'`) even when the values match
    exactly. Complex values must leave as delimited/JSON STRINGs on
    both engines (q129: concat_ws('|', ...) / array_to_string(...)).
    Returns the offending column names of a Spark StructType."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from sensor_data_pipeline_spark.plans import REGISTRY
    from sensor_data_pipeline_spark.session import get_spark

    # override via env to sweep for partitioning/order-dependent
    # nondeterminism (e.g. COMPARE_MASTER=local[32] COMPARE_PARTS=7)
    spark = get_spark(
        app_name="compare-oracle",
        master=os.environ.get("COMPARE_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("COMPARE_PARTS", "8")),
    )
    con = duck_conn(sf_dir)
    n_pass = n_fail = 0
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            bad_cols = complex_output_columns(sdf.schema)
            if bad_cols:
                print(
                    f"FAIL {name}: ARRAY/MAP/STRUCT top-level output column(s) "
                    f"{bad_cols} — the driver canonicalizer cannot sort these "
                    f"(round-8 q129 class); emit as delimited STRING"
                )
                n_fail += 1
                continue
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            frag = fragile_cells(s_rows, s_cols) + fragile_cells(d_rows, d_cols)
            if frag:
                problems.append(
                    f"FRAGILE >2^53 exact integer in output (would break under "
                    f"a float64-rendering driver): {frag[:3]}"
                )
        if not problems:
            hs, hd = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show first diff
                so = sorted(str(sorted(zip(s_cols, r))) for r in s_rows)
                do = sorted(str(sorted(zip(d_cols, r))) for r in d_rows)
                for a, b in zip(so, do):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
