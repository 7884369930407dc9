"""Simulate the driver: smoke entry(spark) at sf0.001, then hash-compare
every queries() entry vs oracle_sql() at sf0.01 via DuckDB."""
import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as e
from lakeapi_spark.session import get_spark

spark = get_spark("drive-contract")

only = set(sys.argv[1:])  # optional query names: check just those, skip smoke

# t1 smoke
if not only:
    df = e.entry(spark)
    rows = df.collect()
    print(f"t1 smoke: entry() -> {len(rows)} rows, schema: {[f.name for f in df.schema.fields]}")
    assert len(rows) > 0

# t2 correctness at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"):
        if getattr(v, "tzinfo", None) is not None:
            v = v.replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)

def vhash(tab):
    names = sorted(tab.column_names)
    cols = [tab.column(n).to_pylist() for n in names]
    rows = sorted(tuple(cell(v) for v in row) for row in zip(*cols)) if cols else []
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16], len(rows), names

qs, oracles = e.queries(), e.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} with oracle")
fails = 0
for name, build in qs.items():
    if only and name not in only:
        continue
    stab = build(spark, SF).toArrow()
    if name not in oracles:
        print(f"  {name}: rows-only, {stab.num_rows} rows")
        continue
    otab = con.sql(oracles[name]).arrow()
    sh, sn, scols = vhash(stab)
    oh, on, ocols = vhash(otab)
    ok = sh == oh and sn == on and scols == ocols
    print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} rows={sn}/{on} hash={sh}/{oh}")
    if not ok:
        fails += 1
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} MISMATCHES")
sys.exit(1 if fails else 0)
