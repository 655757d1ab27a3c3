#!/usr/bin/env python3
"""Scale-correctness check for q16f (near-dup clusters) at SFs where the
recursive-CTE DuckDB oracle is infeasible (reachability over the
all-pairs graph is O(n^2) in the CTE): ground-truth pairs still come
from DuckDB's all-pairs Jaccard, but the connected components are
computed by an independent UNION-FIND here (path compression + union by
size), then compared hash-for-hash against the engine's q16f parquet.
Usage: python3 tools/cc_check.py <sfDir> <q16f_parquet_dir>
"""
import sys, glob, hashlib
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")

# ground truth near-dup pairs: word-3-shingles, exact Jaccard >= 0.8,
# all-pairs (the q16b oracle contract)
pairs = con.execute(r"""
WITH tk AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
sh AS (SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
           ELSE CAST([] AS VARCHAR[]) END) AS sh
       FROM tk),
nz AS (SELECT * FROM sh WHERE len(sh) > 0)
SELECT a.doc_id AS i, b.doc_id AS j
FROM nz a JOIN nz b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
""").fetchall()

# independent CC: union-find with path compression + union by size
parent, size = {}, {}
def find(x):
    parent.setdefault(x, x); size.setdefault(x, 1)
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:
        parent[x], x = root, parent[x]
    return root
def union(a, b):
    ra, rb = find(a), find(b)
    if ra == rb:
        return
    if size[ra] < size[rb]:
        ra, rb = rb, ra
    parent[rb] = ra
    size[ra] += size[rb]
for i, j in pairs:
    union(i, j)

# cluster rep = MIN doc_id per component (the engine contract)
rep = {}
for x in list(parent):
    r = find(x)
    rep[r] = min(rep.get(r, x), x)

doc_ids = [r[0] for r in con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
expected = []
for d in doc_ids:
    cr = rep[find(d)] if d in parent else d
    expected.append((d, cr, 1 if cr == d else 0))

files = glob.glob(f"{outdir}/q16f_dedup_clusters/*.parquet")
if not files:
    print("FAIL: no engine output at", outdir); sys.exit(1)
got = con.execute(
    f"SELECT doc_id, cluster_rep, keep FROM '{outdir}/q16f_dedup_clusters/*.parquet' ORDER BY doc_id"
).fetchall()
got = [(a, b, int(c)) for a, b, c in got]

n_clustered = sum(1 for d, cr, k in expected if cr != d)
if got != expected:
    bad = [(e, g) for e, g in zip(expected, got) if e != g][:5]
    print(f"FAIL: {len([1 for e,g in zip(expected,got) if e!=g])} mismatched rows "
          f"(of {len(expected)}; {len(pairs)} gt pairs); first: {bad}")
    sys.exit(1)
h = hashlib.sha256("\n".join("|".join(map(repr, r)) for r in got).encode()).hexdigest()[:12]
print(f"OK q16f_dedup_clusters @ {sfdir}: {len(got)} rows, {len(pairs)} ground-truth pairs, "
      f"{n_clustered} non-singleton members, hash={h}")
