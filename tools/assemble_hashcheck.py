#!/usr/bin/env python3
"""Assemble the per-key at-scale hash-check record from a campaign log
(tools/campaign_sf100.sh output): check_oracle.py's `ok/FAIL/TIMEOUT`
lines become {key: {status, rows|reason}} JSON, the shape of
bench/hashcheck_sf30_r16.json.

Usage: assemble_hashcheck.py <campaign_log> <out_json> <fixture_desc> <protocol_desc> [key_filter_csv]
Later lines win (a key re-run after a fix overwrites its earlier row).
"""
import json
import re
import sys

log, out, fixture, protocol = sys.argv[1:5]
only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None

results = {}
for line in open(log):
    m = re.match(r"ok\s+(\S+) \((\d+) rows\)", line)
    if m:
        results[m.group(1)] = {"status": "hash_match", "rows": int(m.group(2))}
        continue
    m = re.match(r"WARN (\S+): values match, dtypes differ (.*)", line)
    if m:
        results[m.group(1)] = {"status": "hash_match_dtype_warn",
                               "detail": m.group(2)[:200]}
        continue
    m = re.match(r"TIMEOUT (\S+): (.*)", line)
    if m:
        results[m.group(1)] = {"status": "fail",
                               "reason": f"oracle-side timeout: {m.group(2)[:160]}"}
        continue
    m = re.match(r"FAIL (\S+): (.*)", line)
    if m:
        results[m.group(1)] = {"status": "fail", "reason": m.group(2)[:200]}

if only is not None:
    results = {k: v for k, v in results.items() if k in only}

n_match = sum(1 for v in results.values() if v["status"].startswith("hash_match"))
record = {
    "fixture": fixture,
    "protocol": protocol,
    "summary": {"hash_match": n_match,
                "disclosed_non_rows": len(results) - n_match},
    "results": dict(sorted(results.items())),
}
json.dump(record, open(out, "w"), indent=1)
print(f"{out}: {n_match} hash_match / {len(results)} keys")
for k, v in sorted(results.items()):
    if not v["status"].startswith("hash_match"):
        print(f"  NON-MATCH {k}: {v.get('reason','')[:120]}")
