#!/usr/bin/env python3
"""Oracle-at-scale gate: upgrade the SCALED_CORRECTNESS pins from
self-bootstrapped fingerprints to DuckDB-verified results. The pin
harness (tools/ScaledCheck.scala) catches drift and nondeterminism but
was bootstrapped from the engine's own first run — an op that is
deterministically wrong only above a scale threshold would pin its own
bug. This script runs the SAME DuckDB oracle SQL the sf0.01 driver
gate uses, but against the materialized x10-events / x20-docs scaled
parquet, and hash-compares exactly like tools/check_correctness.py.

Usage: scaled_oracle.py <scaledSfDir> <verifyOutDir>
  <scaledSfDir>  directory laid out like an sf dir whose events/
                 documents/embeddings parquet are the SCALED copies
                 (symlinks fine; Spark-written parquet DIRECTORIES are
                 handled via read_parquet('<dir>/*.parquet'))
  <verifyOutDir> graft.Verify output for the selected gates run
                 against <scaledSfDir>

Merges per-gate verdicts into SCALED_CORRECTNESS.json under
"oracle_checks" with mode="oracle"."""
import sys, json, glob, os, hashlib, subprocess
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
    if t == "events":
        # the scaled copy was written by Spark as TIMESTAMP_LTZ; cast
        # back to naive under UTC so the oracle SQL sees the same
        # wall-clock values the raw testdata carries
        con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(CAST(ts AS TIMESTAMP) AS ts) FROM {src}")
    else:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

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
for name in sorted(os.listdir(out_dir)):
    if name not in oracle:
        continue
    sql = oracle[name]
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                             ignore_index=True)
        duck_df = con.execute(sql).fetchdf()
        rows = len(spark_df) == len(duck_df)
        schema = sorted(map(str.lower, spark_df.columns)) == \
                 sorted(map(str.lower, duck_df.columns))
        h = canon(spark_df) == canon(duck_df) if rows and schema else False
        results[name] = {"mode": "oracle", "rows_match": rows,
                         "schema_match": schema, "hash_match": h,
                         "n_spark": len(spark_df), "n_duck": len(duck_df)}
        if not h and rows and schema:
            s = spark_df[sorted(spark_df.columns)]
            d = duck_df[sorted(duck_df.columns)]
            for i in range(min(len(s), len(d))):
                if canon(s.iloc[[i]]) != canon(d.iloc[[i]]):
                    results[name]["first_diff"] = {"row": i,
                        "spark": s.iloc[i].tolist(), "duck": d.iloc[i].tolist()}
                    break
    except Exception as e:
        results[name] = {"mode": "oracle", "error": str(e)[:300]}

ok = sum(1 for r in results.values() if r.get("hash_match"))
print(json.dumps(results, indent=1, default=str))
print(f"\n{ok}/{len(results)} oracle hash-match at scale")

# write the durable sidecar (ScaledCheck re-splices it on every
# fingerprint re-run, so the oracle verdicts survive pin refreshes) and
# merge into SCALED_CORRECTNESS.json beside the fingerprint pins.
# git_rev stamps WHICH build the verdicts were recorded against —
# ScaledCheck compares it to HEAD at splice time and tags the section
# stale when they differ, so an old sidecar can't masquerade as a
# verdict on the current tree.
try:
    git_rev = subprocess.check_output(
        ["git", "rev-parse", "HEAD"], text=True).strip()
except Exception:
    git_rev = "unknown"
# ADDITIVE merge (same policy as graph_oracle.py): a gate-subset re-run
# must not drop the graph family's verdicts — or vice versa; the
# git_rev restamp + ScaledCheck's stale tag cover verdicts that outlive
# their build
try:
    sidecar = json.load(open("SCALED_ORACLE.json"))
except Exception:
    sidecar = {"checks": {}}
sidecar.setdefault("checks", {}).update(results)
sidecar["sf"] = sf_dir
sidecar["git_rev"] = git_rev
sidecar["n_ok"] = sum(1 for r in sidecar["checks"].values()
                      if r.get("hash_match"))
sidecar["n_checks"] = len(sidecar["checks"])
with open("SCALED_ORACLE.json", "w") as f:
    json.dump(sidecar, f, indent=0, default=str)
    f.write("\n")
sc_path = "SCALED_CORRECTNESS.json"
try:
    sc = json.load(open(sc_path))
except Exception:
    sc = {}
sc["oracle"] = sidecar
with open(sc_path, "w") as f:
    json.dump(sc, f, indent=0, default=str)
    f.write("\n")
print(f"wrote SCALED_ORACLE.json and merged into {sc_path}")
