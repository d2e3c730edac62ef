#!/usr/bin/env python3
"""Dev-side mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Spark parquet dumped by
graft.Verify (columns sorted by name, rows sorted, values stringified)."""
import duckdb, glob, json, math, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return str(v).lower()
    if isinstance(v, float):
        if math.isinf(v): return "inf"
        return repr(v)
    return str(v)

def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name != only: continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    try:
        orel = con.sql(sql)
        ocols, otypes = list(orel.columns), [str(t) for t in orel.types]
        orows = orel.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    srel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    scols, stypes = list(srel.columns), [str(t) for t in srel.types]
    srows = srel.fetchall()
    if sorted(scols) != sorted(ocols):
        print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}")
        fails += 1; continue
    # The driver's hash is TYPE-sensitive (DuckDB SUM(BIGINT) -> HUGEINT broke
    # q_events_* in round 2 with byte-identical stringified values), so the
    # mimic must compare declared column types too, not just names+values.
    # Calibrated to driver behavior: CORRECTNESS_r02 hash-greens queries where
    # oracle BIGINT meets spark INTEGER (row_number etc.), so integer widths
    # up to 64 bits are one class; HUGEINT (int128) is NOT — that was the only
    # hash-mismatch cause in round 2.
    def tclass(t):
        return "INT64ish" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                                   "UTINYINT", "USMALLINT", "UINTEGER") else t
    styped = sorted(zip(scols, [tclass(t) for t in stypes]))
    otyped = sorted(zip(ocols, [tclass(t) for t in otypes]))
    if styped != otyped:
        bad = [(a, b) for a, b in zip(styped, otyped) if a != b]
        print(f"{name}: TYPE MISMATCH {bad} (spark vs oracle)")
        fails += 1; continue
    a, b = rowset(scols, srows), rowset(ocols, orows)
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT spark={len(a)} oracle={len(b)}")
        sa, sb = set(a), set(b)
        for x in list(sa - sb)[:3]: print(f"   spark-only: {x}")
        for x in list(sb - sa)[:3]: print(f"   oracle-only: {x}")
        fails += 1; continue
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        print(f"{name}: VALUE MISMATCH {len(diffs)} differing rows of {len(a)}")
        for x, y in diffs[:3]:
            print(f"   spark : {x}\n   oracle: {y}")
        fails += 1; continue
    print(f"{name}: OK ({len(a)} rows)")
print(f"\n{'FAIL' if fails else 'ALL OK'} ({fails} failures)")
sys.exit(1 if fails else 0)
