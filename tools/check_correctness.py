#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same parquet tables and
compare rows / schema / value-hash (columns sorted by name, values rendered
canonically). Usage: check_correctness.py <sfDir> <verifyOutDir>

Also flags RENDER-WOBBLE: a DECIMAL value whose scale-preserving string
(str(Decimal)) disagrees with its %.6f float rendering is sensitive to
whether a checker environment materializes the column as Decimal objects
or float64 (pandas/duckdb version dependent) — such a gate can hash green
locally and red on the driver (the round-7 p59 lesson). Wobbly gates are
listed loudly so they get quantized to integers BEFORE the driver runs."""
import sys, json, glob, hashlib
from decimal import Decimal
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

def decimal_wobble_cols(df, side):
    """Columns holding Decimal values whose two plausible renderings —
    scale-preserving str() vs %.6f of the float64 a different checker
    env would coerce to — disagree somewhere. Sampled per column."""
    wobbly = []
    for c in df.columns:
        col = df[c]
        if col.dtype != object:
            continue
        for v in col.head(1000):
            if isinstance(v, Decimal) and str(v) != f"{float(v):.6f}":
                wobbly.append(f"{side}:{c}")
                break
    return wobbly

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
        wob = decimal_wobble_cols(spark_df, "spark") + decimal_wobble_cols(duck_df, "duck")
        if wob:
            results[name]["decimal_render_wobble"] = wob
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
wobbly = {n: r["decimal_render_wobble"] for n, r in results.items()
          if r.get("decimal_render_wobble")}
if wobbly:
    print(f"RENDER-WOBBLE WARNING: {len(wobbly)} gate(s) emit DECIMAL values "
          "whose str()/%.6f renderings disagree — can hash green here and red "
          "in the driver's env. Quantize to BIGINT micro-units:")
    for n, cols in sorted(wobbly.items()):
        print(f"  {n}: {', '.join(cols)}")
