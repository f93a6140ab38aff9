#!/usr/bin/env python3
"""Cross-check /tmp/drive_out/<name> parquet against /tmp/drive_out/<name>.sql
in DuckDB over a sf dir — the same compare (sorted columns, sorted rows,
exact values) as tools/check_oracle.py, for ad-hoc Drive runs.

Usage: python3 tools/drive_check.py <name> [sfdir]
"""
import duckdb, sys

name = sys.argv[1]
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")

sql = open(f"/tmp/drive_out/{name}.sql").read()
o = con.sql(sql).df()
s = con.sql(f"SELECT * FROM read_parquet('/tmp/drive_out/{name}/*.parquet')").df()
o = o.reindex(sorted(o.columns), axis=1).sort_values(sorted(o.columns)).reset_index(drop=True)
s = s.reindex(sorted(s.columns), axis=1).sort_values(sorted(s.columns)).reset_index(drop=True)
print(f"oracle rows={len(o)} spark rows={len(s)}")
print("oracle dtypes:", dict(o.dtypes.astype(str)))
print("spark  dtypes:", dict(s.dtypes.astype(str)))
if o.equals(s):
    print(f"{name}: MATCH")
else:
    print(f"{name}: MISMATCH")
    import pandas as pd
    cmp = o.compare(s) if len(o) == len(s) and list(o.columns) == list(s.columns) else None
    if cmp is not None:
        print(cmp.head(20))
    else:
        print("shape/columns differ")
    sys.exit(1)
