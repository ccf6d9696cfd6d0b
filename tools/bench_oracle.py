#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over an sf directory — the denominator of
the suite envelope (driver contract: Spark suite total <= 2x DuckDB total).

Usage: bench_oracle.py <sf_dir> <out_dir_with_oracle_sql.json> [reps]

Prints one JSON line: {"total": sec, "queries": {name: sec, ...}, "reps": n}
taking the MIN over reps per query (same rule as graft.Bench). DuckDB runs
all threads (matching the Spark bench's local[32] contract).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, reps: int = 2) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    print(json.dumps({"total": round(sum(times.values()), 3),
                      "queries": times, "reps": reps, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
