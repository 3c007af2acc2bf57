#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet dump against its DuckDB oracle over the raw
testdata tables. Column order is normalized by sorting column names; row
order by sorting all columns. Floats compared to 1e-9 relative."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints may arrive as int32/int64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('Int64')
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, 'tz', None) is not None:
                # keep tz-awareness VISIBLE: the driver treats TIMESTAMPTZ vs
                # naive TIMESTAMP as a schema mismatch — never normalize it away
                df[c] = s.dt.tz_convert('UTC').astype('datetime64[us, UTC]')
            else:
                df[c] = s.astype('datetime64[us]')
    df = df.sort_values(by=list(df.columns), na_position='first').reset_index(drop=True)
    return df

def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        ta, tb = str(a[c].dtype), str(b[c].dtype)
        if ('datetime' in ta or 'datetime' in tb) and ta != tb:
            return f"SCHEMA dtype col {c} spark={ta} oracle={tb}"
    for c in a.columns:
        x, y = a[c], b[c]
        # int-on-one-side / float-on-the-other is a driver hash FAIL even
        # when the values agree: DuckDB returns HUGEINT for sum(<integer>),
        # which fetchdf() converts to float64 (46.0 vs Spark's int64 46).
        # Oracles must CAST integer sums in the final SELECT to BIGINT.
        if (pd.api.types.is_integer_dtype(x) != pd.api.types.is_integer_dtype(y)
                and (pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y))):
            return (f"DTYPE col {c} spark={x.dtype} oracle={y.dtype} "
                    "(int vs float — driver hashes these differently)")
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv, yv = x.astype(float).values, y.astype(float).values
            nx, ny = np.isnan(xv), np.isnan(yv)
            if not (nx == ny).all():
                return f"NULLS col {c}"
            m = ~nx
            if not np.allclose(xv[m], yv[m], rtol=1e-9, atol=1e-12):
                bad = np.argmax(~np.isclose(xv[m], yv[m], rtol=1e-9, atol=1e-12))
                return f"VALUES col {c} e.g. {xv[m][bad]} vs {yv[m][bad]}"
            if not (xv[m] == yv[m]).all():
                # still hash-relevant: report exact mismatches distinctly
                nbad = int((xv[m] != yv[m]).sum())
                return f"FLOAT-INEXACT col {c} ({nbad} values differ below 1e-9 — driver hash may fail)"
        else:
            if not x.astype(object).where(pd.notna(x), None).equals(
                   y.astype(object).where(pd.notna(y), None)):
                neq = (x.astype(object).where(pd.notna(x), None) !=
                       y.astype(object).where(pd.notna(y), None))
                i = int(np.argmax(neq.values))
                return f"VALUES col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
    return "OK"

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet") or glob.glob(f"{d}/**/*.parquet", recursive=True)
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERR {str(e)[:160]}"
            continue
        results[name] = compare(norm(spark_df), norm(odf))
    width = max(len(k) for k in results)
    nok = 0
    for k in sorted(results):
        ok = results[k] == "OK" or results[k].startswith("NO-ORACLE")
        nok += ok
        print(f"{'PASS' if ok else 'FAIL'} {k:<{width}} {results[k]}")
    print(f"== {nok}/{len(results)} pass")
    sys.exit(0 if nok == len(results) else 1)

if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01',
         sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out')
