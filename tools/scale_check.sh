#!/bin/bash
# Scale hash-check protocol (PERF "Scale hash-check" record):
#   scale_check.sh <sfDir> <voutDir> <primary_cap_s> <secondary_cap_s> [only_keys]
#
# 1. graft.Verify dumps the full registry (or only_keys) at <sfDir>.
# 2. check_oracle.py primary pass: every oracle EXCEPT the recursive-CTE
#    connected-components chain (clusters/weights/apply/ledger — the r12
#    documented exclusion: DuckDB's recursive CTE has no feasible plan at
#    factor 300) under <primary_cap_s> per oracle.
# 3. Secondary pass: the CTE-chain keys the verdict named
#    (apply_artifacts, corpus_ledger) plus q_dedup_semantic, each under
#    <secondary_cap_s> — a timeout is a DISCLOSED infeasible-oracle row.
set -uo pipefail
cd "$(dirname "$0")/.."
SF="$1"; VOUT="$2"; CAP1="${3:-1800}"; CAP2="${4:-900}"; ONLY="${5:-}"

if [ -n "$ONLY" ]; then
  SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    tools/run_main.sh graft.Verify "$SF" "$VOUT"
else
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    tools/run_main.sh graft.Verify "$SF" "$VOUT"
fi

python3 - "$VOUT" <<'EOF'
import json, sys, shutil
v = sys.argv[1]
shutil.copy(f"{v}/oracle_sql.json", f"{v}/oracle_sql_full.json")
full = json.load(open(f"{v}/oracle_sql_full.json"))
cte = {"q_dedup_clusters", "q_dup_weights", "q_dedup_apply", "q_dedup_ledger"}
secondary = {k for k in ("q_dedup_apply_artifacts", "q_corpus_ledger",
                         "q_dedup_semantic") if k in full}
primary = {k: s for k, s in full.items() if k not in cte | secondary}
json.dump(primary, open(f"{v}/oracle_sql_primary.json", "w"))
json.dump({k: full[k] for k in secondary}, open(f"{v}/oracle_sql_secondary.json", "w"))
print(f"primary={len(primary)} secondary={len(secondary)} excluded_cte={len(cte & set(full))}")
EOF

# restore the full registry file even if a pass (or the operator) dies
# mid-run: oracle_sql.json must never be left pointing at a pass subset
trap 'cp "$VOUT/oracle_sql_full.json" "$VOUT/oracle_sql.json"' EXIT

echo "=== PRIMARY PASS (cap ${CAP1}s/oracle) ==="
cp "$VOUT/oracle_sql_primary.json" "$VOUT/oracle_sql.json"
python3 tools/check_oracle.py "$SF" "$VOUT" "$CAP1"
P=$?
echo "=== SECONDARY PASS (CTE-chain keys, cap ${CAP2}s/oracle) ==="
cp "$VOUT/oracle_sql_secondary.json" "$VOUT/oracle_sql.json"
python3 tools/check_oracle.py "$SF" "$VOUT" "$CAP2"
S=$?
echo "primary_exit=$P secondary_exit=$S"
# gate on the primary pass (hash-match failures there are engine bugs);
# secondary timeouts are DISCLOSED oracle-infeasibility rows, not failures
exit "$P"
