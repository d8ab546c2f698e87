#!/usr/bin/env python3
"""Time the oracle SQL in DuckDB at a given SF as the same-scale
single-node baseline (the judge's methodology): min of N runs per
query, 32 threads, against the same parquet the Spark bench reads.
Usage: python3 tools/baseline.py <sfDir> <oracle_sql.json> [query ...]
Prints one JSON line: {"queries": {name: sec}, "total": sec}.
"""
import sys, json, time, os
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    # Spark-written tables are DIRECTORIES of part files (the 10x
    # ScaleData replicas); DuckDB needs the glob form for those
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_path))
out, total = {}, 0.0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    best = None  # min over SUCCESSFUL runs; a late failure must not
    for _ in range(2):  # discard an earlier good sample
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"# {name} failed: {e}", file=sys.stderr)
            break
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    best = -1.0 if best is None else best
    out[name] = round(best, 3)
    if best >= 0:
        total += best
    print(f"# {name}: {out[name]}", file=sys.stderr)
print(json.dumps({"queries": out, "total": round(total, 2)}))
