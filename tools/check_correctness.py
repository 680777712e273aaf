#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same parquet tables and
compare rows / schema / value-hash (columns sorted by name, values rendered
canonically). Usage: check_correctness.py <sfDir> <verifyOutDir>"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    lines = []
    for row in df.itertuples(index=False):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                parts.append("NULL")
            elif isinstance(v, float):
                parts.append(f"{v:.6f}")
            else:
                parts.append(str(v))
        lines.append("|".join(parts))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()

results = {}
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                             ignore_index=True)
        duck_df = con.execute(sql).fetchdf()
        rows = len(spark_df) == len(duck_df)
        schema = sorted(map(str.lower, spark_df.columns)) == sorted(map(str.lower, duck_df.columns))
        duck_df.columns = [c for c in duck_df.columns]
        h = canon(spark_df) == canon(duck_df) if rows and schema else False
        results[name] = {"rows_match": rows, "schema_match": schema, "hash_match": h,
                         "n_spark": len(spark_df), "n_duck": len(duck_df)}
        if not h and rows and schema:
            s, d = spark_df[sorted(spark_df.columns)], duck_df[sorted(duck_df.columns)]
            for i in range(min(len(s), len(d))):
                if canon(s.iloc[[i]]) != canon(d.iloc[[i]]):
                    results[name]["first_diff"] = {"row": i,
                        "spark": s.iloc[i].tolist(), "duck": d.iloc[i].tolist()}
                    break
    except Exception as e:
        results[name] = {"error": str(e)[:300]}

ok = sum(1 for r in results.values() if r.get("hash_match"))
print(json.dumps(results, indent=1, default=str))
print(f"\n{ok}/{len(results)} hash-match")
