#!/usr/bin/env python3
"""Graph oracle-at-scale: recompute the planted-graph family in DuckDB
and hash-compare against the Spark dumps from graft.tools.GraphOracleDump.

The planted-graph fingerprint pins (SCALED_PINS.txt pagerank_planted)
were self-bootstrapped — they catch drift, not wrongness-at-pin-time.
Every op here is all-integer with statically unrolled iterations, so
the DuckDB replay is exact: 3 PageRank mass-passes (damping 850000 ppm,
integer division), 3 BFS min-relaxation rounds from seed node 1, 3
k-core peel rounds at k=8, and degree-ordered-orientation triangle
counting (each triangle counted once as (a->b, a->c, b->c) with
endpoints ordered by (degree, node)).

Usage: graph_oracle.py <dumpDir>     # GraphOracleDump's outDir

Merges per-op verdicts (mode="oracle") into the SCALED_ORACLE.json
sidecar (additive — estimator/text verdicts from scaled_oracle.py are
kept) and re-merges the sidecar into SCALED_CORRECTNESS.json."""
import sys, json, glob, os, hashlib, subprocess
import duckdb
import pandas as pd

dump_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/out_graph"
meta = json.load(open(f"{dump_dir}/meta.json"))
edges_glob = f"{meta['edges']}/*.parquet"

con = duckdb.connect()
con.execute(f"CREATE VIEW edges AS SELECT * FROM read_parquet('{edges_glob}')")

# 3 unrolled integer mass-passes; score'(v) = 150000 + sum over distinct
# edges u->v of score(u)*850000 // (1000000*outdeg(u)); scores start 1e6
PAGERANK = """
WITH e AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS d FROM edges),
nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT d FROM e),
od AS MATERIALIZED (SELECT s AS node, COUNT(*) AS od FROM e GROUP BY 1),
ind AS MATERIALIZED (SELECT d AS node, COUNT(*) AS id FROM e GROUP BY 1),
s0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS sc FROM nodes),
i1 AS MATERIALIZED (SELECT e.d AS node, CAST(SUM(s0.sc * 850000 // (1000000 * od.od)) AS BIGINT) AS m
       FROM s0 JOIN od ON s0.node = od.node JOIN e ON e.s = s0.node GROUP BY 1),
s1 AS MATERIALIZED (SELECT n.node, CAST(150000 + COALESCE(i1.m, 0) AS BIGINT) AS sc
       FROM nodes n LEFT JOIN i1 ON n.node = i1.node),
i2 AS MATERIALIZED (SELECT e.d AS node, CAST(SUM(s1.sc * 850000 // (1000000 * od.od)) AS BIGINT) AS m
       FROM s1 JOIN od ON s1.node = od.node JOIN e ON e.s = s1.node GROUP BY 1),
s2 AS MATERIALIZED (SELECT n.node, CAST(150000 + COALESCE(i2.m, 0) AS BIGINT) AS sc
       FROM nodes n LEFT JOIN i2 ON n.node = i2.node),
i3 AS MATERIALIZED (SELECT e.d AS node, CAST(SUM(s2.sc * 850000 // (1000000 * od.od)) AS BIGINT) AS m
       FROM s2 JOIN od ON s2.node = od.node JOIN e ON e.s = s2.node GROUP BY 1),
s3 AS MATERIALIZED (SELECT n.node, CAST(150000 + COALESCE(i3.m, 0) AS BIGINT) AS sc
       FROM nodes n LEFT JOIN i3 ON n.node = i3.node)
SELECT s3.node, s3.sc AS score_micro,
       CAST(COALESCE(ind.id, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(od.od, 0) AS BIGINT) AS out_deg
FROM s3 LEFT JOIN ind ON s3.node = ind.node LEFT JOIN od ON s3.node = od.node
ORDER BY score_micro DESC, s3.node
"""

# 3 min-relaxation rounds from seed {1}; unreached nodes absent
BFS = """
WITH e AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS d FROM edges),
d0 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth),
d1 AS MATERIALIZED (SELECT node, MIN(depth) AS depth FROM (
         SELECT node, depth FROM d0
         UNION ALL SELECT e.d, d0.depth + 1 FROM d0 JOIN e ON e.s = d0.node
       ) GROUP BY node),
d2 AS MATERIALIZED (SELECT node, MIN(depth) AS depth FROM (
         SELECT node, depth FROM d1
         UNION ALL SELECT e.d, d1.depth + 1 FROM d1 JOIN e ON e.s = d1.node
       ) GROUP BY node),
d3 AS MATERIALIZED (SELECT node, MIN(depth) AS depth FROM (
         SELECT node, depth FROM d2
         UNION ALL SELECT e.d, d2.depth + 1 FROM d2 JOIN e ON e.s = d2.node
       ) GROUP BY node)
SELECT node, CAST(depth AS BIGINT) AS depth FROM d3 ORDER BY depth, node
"""

# 3 peel rounds at k=8 over canonical undirected pairs
KCORE = """
WITH e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst),
g0 AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
       GROUP BY node HAVING COUNT(*) >= 8),
e1 AS MATERIALIZED (SELECT e0.a, e0.b FROM e0
       JOIN g0 x ON e0.a = x.node JOIN g0 y ON e0.b = y.node),
g1 AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1)
       GROUP BY node HAVING COUNT(*) >= 8),
e2 AS MATERIALIZED (SELECT e1.a, e1.b FROM e1
       JOIN g1 x ON e1.a = x.node JOIN g1 y ON e1.b = y.node),
g2 AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
       GROUP BY node HAVING COUNT(*) >= 8),
e3 AS MATERIALIZED (SELECT e2.a, e2.b FROM e2
       JOIN g2 x ON e2.a = x.node JOIN g2 y ON e2.b = y.node)
SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
FROM (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3)
GROUP BY node ORDER BY node
"""

# degree-ordered orientation (Schank-Wagner forward method): every
# triangle closes exactly once as (a->b, a->c, b->c), b before c in
# (deg, node) key order
TRIANGLES = """
WITH und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             FROM edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT node, COUNT(*) AS dg
        FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
o AS MATERIALIZED (SELECT CASE WHEN (da.dg, u.a) < (db.dg, u.b) THEN u.a ELSE u.b END AS src,
             CASE WHEN (da.dg, u.a) < (db.dg, u.b) THEN u.b ELSE u.a END AS dst,
             CASE WHEN (da.dg, u.a) < (db.dg, u.b) THEN db.dg ELSE da.dg END AS dd
      FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
w AS MATERIALIZED (SELECT x.src AS a, x.dst AS b, y.dst AS c
      FROM o x JOIN o y ON x.src = y.src AND (x.dd, x.dst) < (y.dd, y.dst)),
t AS MATERIALIZED (SELECT w.a, w.b, w.c FROM w JOIN o z ON w.b = z.src AND w.c = z.dst),
pern AS MATERIALIZED (SELECT node, COUNT(*) AS n_triangles
         FROM (SELECT a AS node FROM t UNION ALL SELECT b FROM t
               UNION ALL SELECT c FROM t) GROUP BY 1)
SELECT node, CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST((SELECT SUM(n_triangles) FROM pern) // 3 AS BIGINT) AS n_total
FROM pern ORDER BY n_triangles DESC, node
"""

ORACLES = {"pagerank_planted": PAGERANK, "bfs_planted": BFS,
           "kcore_planted": KCORE, "triangles_planted": TRIANGLES}

# sidecar keys: the pinned x4 configuration keeps the bare names; any
# other scale records additively under a _x{k} suffix so depth rungs
# (x20 = 8M edges) coexist with the x4 rows instead of replacing them
def sidecar_key(name, k):
    return name if k == 4 else f"{name}_x{k}"



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
for name, sql in ORACLES.items():
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{dump_dir}/{name}/*.parquet"))],
                             ignore_index=True)
        duck_df = con.execute(sql).fetchdf()
        rows = len(spark_df) == len(duck_df)
        schema = sorted(map(str.lower, spark_df.columns)) == \
                 sorted(map(str.lower, duck_df.columns))
        h = canon(spark_df) == canon(duck_df) if rows and schema else False
        results[sidecar_key(name, meta["k"])] = {
            "mode": "oracle", "rows_match": rows,
            "schema_match": schema, "hash_match": h,
            "n_spark": len(spark_df), "n_duck": len(duck_df)}
        if not h and rows and schema:
            s = spark_df[sorted(spark_df.columns)]
            d = duck_df[sorted(duck_df.columns)]
            for i in range(min(len(s), len(d))):
                if canon(s.iloc[[i]]) != canon(d.iloc[[i]]):
                    results[sidecar_key(name, meta["k"])]["first_diff"] = {"row": i,
                        "spark": s.iloc[i].tolist(), "duck": d.iloc[i].tolist()}
                    break
    except Exception as e:
        results[sidecar_key(name, meta["k"])] = {"mode": "oracle", "error": str(e)[:300]}

ok = sum(1 for r in results.values() if r.get("hash_match"))
print(json.dumps(results, indent=1, default=str))
print(f"\n{ok}/{len(results)} graph oracle hash-match at x{meta['k']}")

# ADDITIVE merge into the sidecar: keep scaled_oracle.py's verdicts,
# add/overwrite the graph family's, restamp git_rev
try:
    sidecar = json.load(open("SCALED_ORACLE.json"))
except Exception:
    sidecar = {"checks": {}}
sidecar.setdefault("checks", {}).update(results)
try:
    sidecar["git_rev"] = subprocess.check_output(
        ["git", "rev-parse", "HEAD"], text=True).strip()
except Exception:
    sidecar["git_rev"] = "unknown"
if meta["k"] == 4:
    sidecar["graph_edges"] = meta["edges"]
else:
    sidecar[f"graph_edges_x{meta['k']}"] = meta["edges"]
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
print(f"merged into SCALED_ORACLE.json and {sc_path}")
