#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and compare row/schema/value hashes.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Verify must have been run first:
  sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_out")
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

def kind(col) -> str:
    """Coarse dtype family, used to catch int-vs-float oracle typing bugs
    (DuckDB DECIMAL(38,0) renders as float64/object and %.10g can mask it)."""
    if pd.api.types.is_integer_dtype(col):
        return "int"
    if pd.api.types.is_float_dtype(col):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(col):
        return "datetime"
    if pd.api.types.is_bool_dtype(col):
        return "bool"
    return "other"

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize numeric-ish dtypes so int32 vs int64 etc. don't matter
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def hash_df(df: pd.DataFrame) -> str:
    s = df.to_csv(index=False, float_format="%.10g")
    return hashlib.sha256(s.encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1; continue
        bad_kinds = [(c, kind(spark_df[c]), kind(duck_df[c]))
                     for c in spark_df.columns
                     if kind(spark_df[c]) != kind(duck_df[c])
                     and {kind(spark_df[c]), kind(duck_df[c])} <= {"int", "float", "other"}]
        if bad_kinds:
            print(f"FAIL {name}: dtype family mismatch {bad_kinds} "
                  "(cast the oracle column, e.g. CAST(... AS BIGINT))")
            n_fail += 1; continue
        hs, hd = hash_df(spark_df), hash_df(duck_df)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(spark_df)} rows)")
            # show first differing rows for debugging
            neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark:", spark_df.loc[i].to_dict())
                print("  duck :", duck_df.loc[i].to_dict())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
