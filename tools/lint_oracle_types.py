#!/usr/bin/env python3
"""Regenerate src/test/resources/oracle_types.json — the DuckDB result-type
sidecar that OracleTypeLintSpec checks every Spark query schema against.

Why: the driver's correctness hash is type-strict.  DuckDB types sum(<any
integer>) as HUGEINT while Spark emits BIGINT, so an uncast integer sum in
an oracle reds the round even when every value matches (this bug class hit
pack_chunked in r6 and ann_label_audit / text_langid_eval in r7).  This
tool records what DuckDB will actually emit per oracle column; the Scala
test compares it to the Spark schema, so the mismatch is caught in
`sbt test` — before the driver ever runs.

Usage:
    python3 tools/lint_oracle_types.py [oracle_sql.json] [sfdir]

If oracle_sql.json is not given, it is produced via
`sbt "runMain graft.Verify --sql-only /tmp/oracle_sql.json"` by the caller;
this script only DESCRIBEs.  Types are canonicalized to the spark-side
vocabulary (bigint/int/smallint/tinyint/double/float/varchar/boolean/
date/timestamp/decimal/list/struct/binary); HUGEINT/UHUGEINT stay as-is so
the Scala test reds on them explicitly.
"""
import duckdb, json, re, sys

sql_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle_sql.json"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
out = "src/test/resources/oracle_types.json"

con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")

CANON = {
    "BIGINT": "bigint", "INTEGER": "int", "SMALLINT": "smallint",
    "TINYINT": "tinyint", "UBIGINT": "ubigint", "UINTEGER": "uint",
    "DOUBLE": "double", "FLOAT": "float", "VARCHAR": "string",
    "BOOLEAN": "boolean", "DATE": "date", "BLOB": "binary",
    "HUGEINT": "HUGEINT", "UHUGEINT": "UHUGEINT",
}

def canon(t):
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]"):
        return "array<" + canon(t[:-2]) + ">"
    if t.startswith("STRUCT"):
        return "struct"
    if t.startswith("MAP"):
        return "map"
    return CANON.get(t, t.lower())

oracle = json.load(open(sql_json))
types, errs, huge = {}, [], []
for name, sql in sorted(oracle.items()):
    try:
        df = con.sql(f"DESCRIBE ({sql})").df()
    except Exception as e:
        errs.append((name, str(e).split("\n")[0][:160]))
        continue
    cols = {r.column_name: canon(r.column_type) for r in df.itertuples()}
    types[name] = cols
    for c, t in cols.items():
        if "HUGEINT" in t:
            huge.append(f"{name}.{c}")

with open(out, "w") as f:
    json.dump(types, f, indent=1, sort_keys=True)
print(f"wrote {out}: {len(types)} oracles")
if errs:
    print(f"DESCRIBE errors ({len(errs)}):")
    for n, e in errs:
        print(f"  {n}: {e}")
if huge:
    print(f"HUGEINT columns — these WILL red the driver hash, cast them:")
    for h in huge:
        print(f"  {h}")
    sys.exit(1)
