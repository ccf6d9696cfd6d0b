#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare with the Verify.scala parquet dumps
(columns sorted by name, rows sorted, exact value compare).

Optional third arg timeout_s: per-oracle wall cap via duckdb interrupt
(the bench_oracle.py watchdog protocol) — at sf100 a single oracle with
no out-of-core plan must time out as a DISCLOSED skip ("TIMEOUT" row),
not hold the whole hash-check hostage."""
import json
import os
import sys
import glob
import threading
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, timeout_s: float | None = None) -> None:
    con = duckdb.connect()
    # out-of-core spill: the gram-join oracles (decontaminate/coverage)
    # exceed RAM at sf1 without it and die with an allocation failure
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET preserve_insertion_order=false")
    # bound the allocator: DuckDB's default limit is 80% of PHYSICAL RAM,
    # which assumes it owns the machine — in a scale-audit window a Spark
    # JVM is resident too, and q_dedup_ngram's posting-list oracle at sf30
    # ballooned to 92 GB anon and drew the kernel OOM killer. A hard cap
    # forces the documented out-of-core path (temp_directory above).
    # validated: a malformed env var should fail with a clear message,
    # not a confusing SQL error (same guard as bench_oracle.py)
    mem_limit = os.environ.get("DUCKDB_MEM", "48GB")
    import re
    # accept everything DuckDB itself accepts: case-insensitive units
    # ('48gb'), percent-of-RAM ('80%'), and '-1' for unlimited — being
    # stricter than the engine broke previously-working env settings
    if not re.fullmatch(
            r"-1|[0-9]+(\.[0-9]+)?\s*%|[0-9]+(\.[0-9]+)?\s*[KMGT]i?B",
            mem_limit, re.IGNORECASE):
        sys.exit(f"DUCKDB_MEM={mem_limit!r} is not a DuckDB memory_limit "
                 "(e.g. '48GB', '80%', '-1')")
    con.execute(f"SET memory_limit='{mem_limit}'")
    for t in TABLES:
        # driver fixtures are single files; Spark-written scale fixtures
        # (ScaleFixtures output) are directories of part files — same
        # handling as bench_oracle.py
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        if not (os.path.isdir(p) or os.path.isfile(p)):
            # scaled fixtures (ScaleFixtures output) carry only the tables
            # that scale (events/documents/embeddings); a query against a
            # missing view fails loudly per-query below instead of
            # aborting the whole check
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    def run_oracle(sql: str) -> pd.DataFrame:
        if timeout_s is None:
            return con.execute(sql).df()
        done = threading.Event()
        timed_out = threading.Event()

        def watchdog() -> None:
            if not done.wait(timeout_s):
                timed_out.set()
                con.interrupt()

        threading.Thread(target=watchdog, daemon=True).start()
        t0 = time.monotonic()
        try:
            return con.execute(sql).df()
        except Exception:
            if timed_out.is_set():
                raise TimeoutError(
                    f"oracle exceeded {timeout_s:.0f}s cap (interrupted)") from None
            raise
        finally:
            done.set()
            if timed_out.is_set():  # interrupt landed post-completion: drain it
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
            print(f"       [{time.monotonic()-t0:.1f}s oracle]",
                  file=sys.stderr, flush=True)

    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_bad += 1
                continue
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            try:
                duck_df = run_oracle(sql)
            except TimeoutError as te:
                # disclosed infeasible row, not a failure of the engine
                print(f"TIMEOUT {name}: {te}")
                n_skip += 1
                continue
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
                n_bad += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                n_bad += 1
                continue
            # dtype check (schema part of the gate)
            dt_mismatch = [(c, str(a[c].dtype), str(b[c].dtype))
                           for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
            a2 = a.astype({c: str for c in a.columns})
            b2 = b.astype({c: str for c in b.columns})
            neq = (a2 != b2).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ; first at {i}:")
                print("  spark:", a.iloc[i].to_dict())
                print("  duck :", b.iloc[i].to_dict())
                n_bad += 1
            elif dt_mismatch:
                print(f"WARN {name}: values match, dtypes differ {dt_mismatch}")
                n_ok += 1
            else:
                print(f"ok   {name} ({len(a)} rows)")
                n_ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed"
          + (f", {n_skip} oracle-timeout (disclosed)" if n_skip else ""))
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else None)
