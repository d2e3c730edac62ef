#!/usr/bin/env python3
"""Generate src/main/scala/graft/OracleLiterals.scala: literal VALUES oracles
("regression pins") for queries whose arithmetic DuckDB cannot re-express
(S2/H3 cell ids, hash families, LSH buckets, BMP decode). Reads the Spark
parquet dumps of TWO graft.Verify runs (sf0.01 and sf0.001) and emits a
per-query SQL whose VALUES branch is selected on count(orders), so running
at any other SF fails loudly (empty oracle) instead of silently passing.

Usage: gen_pins.py <verify_out_sf0.01> <verify_out_sf0.001> <query> [query...]
"""
import glob, sys, duckdb

out_sf001, out_sf0001 = sys.argv[1], sys.argv[2]
queries = sys.argv[3:]
ORDERS = {out_sf001: 15000, out_sf0001: 1500}

con = duckdb.connect()

def sql_type(dt):
    dt = str(dt).upper()
    if dt in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT"): return dt
    if dt == "DOUBLE": return "DOUBLE"
    if dt == "FLOAT": return "FLOAT"
    if dt == "BOOLEAN": return "BOOLEAN"
    if dt == "VARCHAR": return "VARCHAR"
    raise SystemExit(f"unsupported pin column type {dt}")

def lit(v, t):
    if v is None: return f"NULL::{t}"
    if t == "VARCHAR": return "'" + str(v).replace("'", "''") + "'"
    if t == "BOOLEAN": return "true" if v else "false"
    if t == "DOUBLE": return f"{v!r}::DOUBLE"
    return f"{v}::{t}"

def branch(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files: raise SystemExit(f"no spark output for {name} in {outdir}")
    rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
    cols = list(rel.columns)
    types = [sql_type(t) for t in rel.types]
    rows = rel.fetchall()
    vals = ",\n  ".join(
        "(" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")" for r in rows)
    collist = ", ".join(f'"{c}"' for c in cols)
    return (f"SELECT * FROM (VALUES\n  {vals}\n) t({collist})\n"
            f"WHERE (SELECT COUNT(*) FROM orders) = {ORDERS[outdir]}"), len(rows)

entries = []
for q in queries:
    b1, n1 = branch(out_sf001, q)
    b2, n2 = branch(out_sf0001, q)
    sql = b1 + "\nUNION ALL\n" + b2
    entries.append((q, sql, n1, n2))
    print(f"{q}: pinned {n1} rows (sf0.01) + {n2} rows (sf0.001)")

# SQL literals can exceed the JVM's 64 KB string-constant-pool limit, so pins
# ship as classpath resources read by graft.OracleLiterals at runtime.
names = []
for q, sql, _, _ in entries:
    with open(f"src/main/resources/pins/{q}.sql", "w") as f:
        f.write(sql + "\n")
    names.append(q)
print(f"wrote {len(names)} pin resources: {', '.join(names)}")
print("update OracleLiterals.pinned if the query list changed:")
print("  " + ", ".join(f'"{n}"' for n in names))
