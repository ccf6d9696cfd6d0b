#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over an sf directory — the denominator of
the suite envelope (driver contract: Spark suite total <= 2x DuckDB total).

Usage: bench_oracle.py <sf_dir> <out_dir_with_oracle_sql.json> [reps] [timeout_s]

Prints one JSON line: {"total": sec, "queries": {name: sec, ...}, "reps": n}
taking the MIN over reps per query (same rule as graft.Bench). DuckDB runs
all threads (matching the Spark bench's local[32] contract).

timeout_s (optional, default none): per-query wall cap enforced via
duckdb's interrupt() from a watchdog thread — the sf100 infeasible-row
protocol. A row that exceeds the cap is recorded in "errors" as
"Timeout: >Ns" and disclosed, instead of holding the whole pairing
hostage to one oracle with no out-of-core plan at that match volume.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, reps: int = 2,
         timeout_s: float | None = None) -> None:
    import os
    con = duckdb.connect()
    # same session pragmas as check_oracle.py — without them the heavy
    # oracles (q_dedup_ngram's posting-list aggregate at sf30) buffer for
    # insertion order and spill to ./.tmp until the disk fills; the
    # correctness gate always ran with these, so the pairing must too
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET preserve_insertion_order=false")
    # bound the allocator (default: 80% of physical RAM, which assumes
    # DuckDB owns the machine): q_dedup_ngram's posting-list oracle at sf30
    # ballooned to 92 GB anon beside a resident Spark JVM and drew the
    # kernel OOM killer; a hard cap forces the out-of-core path instead.
    # The value is validated (a malformed env var must fail with a clear
    # message, not a confusing SQL error) and echoed in the output JSON so
    # paired runs are self-describing: a capped oracle may spill and run
    # slower than an uncapped one, so the cap is part of the protocol.
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
        # (ScaleFixtures output) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    def run_once(sql: str) -> float:
        t0 = time.monotonic()
        if timeout_s is None:
            con.execute(sql).fetchall()
            return time.monotonic() - t0
        timed_out = threading.Event()

        def watchdog() -> None:
            if not done.wait(timeout_s):
                timed_out.set()
                con.interrupt()

        done = threading.Event()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        try:
            con.execute(sql).fetchall()
        except Exception:
            if timed_out.is_set():
                raise TimeoutError(f">{timeout_s:.0f}s (interrupted)") from None
            raise
        finally:
            done.set()
        if timed_out.is_set():  # interrupt landed after completion — still over cap
            # the interrupt flag may linger on the shared connection with no
            # active query; drain it with a throwaway statement so it cannot
            # spuriously cancel the NEXT oracle run on this connection
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass
            raise TimeoutError(f">{timeout_s:.0f}s")
        return time.monotonic() - t0

    times = {}
    errors = {}
    for name, sql in sorted(oracle.items()):
        # a single oracle OOM-ing at a scaled fixture must not lose the
        # whole run: record the error, disclose it in the JSON, move on.
        # MIN is over the SUCCESSFUL reps (mirrors Bench.scala's good-reps
        # logic) — a timeout on rep 2 must not discard rep 1's valid time.
        ok, last_err = [], None
        for _ in range(reps):
            try:
                ok.append(run_once(sql))
            except Exception as e:  # noqa: BLE001 — any engine failure
                last_err = e
                # a timeout will very likely repeat; don't pay the cap twice
                if isinstance(e, TimeoutError):
                    break
        if not ok:
            errors[name] = f"{type(last_err).__name__}: {last_err}"
            print(f"[oracle] {name} FAILED {errors[name]}", file=sys.stderr, flush=True)
            continue
        times[name] = min(ok)
        # progress to stderr (stdout stays the one JSON line): at scaled
        # fixtures a single oracle can run for minutes or OOM the process —
        # the last line printed names the culprit
        print(f"[oracle] {name} {times[name]:.3f}s", file=sys.stderr, flush=True)

    # IDENTICAL cross-query outlier retry to graft.Bench (median + 6*MAD,
    # 0.4 s absolute floor, min kept, disclosed): the Spark side grants
    # first-pass outliers one extra rep to shed host-contention bursts, so
    # the oracle side of every pairing must apply the same one-sided
    # protocol or the paired ratio is biased in Spark's favor.
    retried = {}
    ordered = sorted(times.values())
    if ordered:  # same empty-suite guard as Bench.scala's okTimes.isEmpty
        median = ordered[len(ordered) // 2]
        mad = sorted(abs(t - median) for t in ordered)[len(ordered) // 2]
        cutoff = max(0.4, median + 6 * mad)
        for name in [n for n, t in times.items() if t > cutoff]:
            # a retried query is by definition a slow outlier — under the
            # per-query cap its retry may time out. Keep the first-pass time
            # on any retry failure; never lose the whole run's JSON here.
            try:
                t2 = run_once(oracle[name])
            except Exception as e:  # noqa: BLE001
                retried[name] = [round(times[name], 4),
                                 f"retry failed: {type(e).__name__}"]
                continue
            retried[name] = [round(times[name], 4), round(t2, 4)]
            times[name] = min(times[name], t2)

    times = {k: round(v, 4) for k, v in times.items()}
    print(json.dumps({"total": round(sum(times.values()), 3),
                      "queries": times, "retried": retried, "errors": errors,
                      "reps": reps, "sf": sf_dir,
                      "memory_limit": mem_limit}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 2,
         float(sys.argv[4]) if len(sys.argv) > 4 else None)
