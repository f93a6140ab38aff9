import duckdb, json, sys, glob, os
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
vout = sys.argv[2] if len(sys.argv) > 2 else '/tmp/vout'
con = duckdb.connect()
for tbl in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")
oracle = json.load(open(f'{vout}/oracle_sql.json'))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        act = pd.read_parquet(f'{vout}/{name}')
        exp = exp.reindex(sorted(exp.columns), axis=1)
        act = act.reindex(sorted(act.columns), axis=1)
        if list(exp.columns) != list(act.columns):
            bad.append((name, f"cols: oracle={list(exp.columns)} spark={list(act.columns)}")); continue
        exp2 = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        act2 = act.sort_values(by=list(act.columns)).reset_index(drop=True)
        if len(exp2) != len(act2):
            bad.append((name, f"rows: oracle={len(exp2)} spark={len(act2)}")); continue
        # dtype-strict: the driver's hash is type-sensitive (HUGEINT/int32
        # class — see OracleTypeLintSpec).  duckdb HUGEINT lands in pandas
        # as float64 and reds here against spark int64, as it should.
        dt_bad = [(c, str(exp2[c].dtype), str(act2[c].dtype))
                  for c in exp2.columns if exp2[c].dtype != act2[c].dtype]
        if dt_bad:
            bad.append((name, 'dtypes: ' + ', '.join(
                f'{c} oracle={a} spark={b}' for c, a, b in dt_bad)))
            continue
        try:
            pd.testing.assert_frame_equal(exp2, act2, check_dtype=False, check_exact=True)
            ok.append(name)
        except AssertionError as e:
            bad.append((name, str(e).split('\n')[0] + ' | ' + str(e)[-300:].replace('\n',' ')))
    except Exception as e:
        bad.append((name, 'ERROR: ' + str(e)[:200]))
print(f"OK {len(ok)}: {' '.join(ok)}")
print(f"\nBAD {len(bad)}:")
for n, m in bad: print(f"  {n}: {m[:360]}")
noracle = [os.path.basename(p) for p in glob.glob(f'{vout}/*') if os.path.isdir(p) and os.path.basename(p) not in oracle]
print(f"\nno-oracle (rows-only): {noracle}")
for n in noracle:
    df = pd.read_parquet(f'{vout}/{n}')
    print(f"  {n}: rows={len(df)}")
