#!/bin/bash
# One batch of the at-scale hash-check campaign (PERF "Scale hash-check"):
#   hashcheck_batch.sh <sfDir> <voutDir> <cap_s> <keys_csv> [logFile]
#
# Dumps ONLY the named keys with graft.Verify (SPARK_GRAFT_ONLY filters
# the dumped oracle_sql.json to the subset, so check_oracle compares
# exactly that), runs the oracle compare under the per-oracle watchdog,
# then deletes the batch's parquet dumps to keep the campaign inside the
# container's free disk. Results are appended (one line per key: the
# check_oracle ok/FAIL/TIMEOUT lines) to the log for the record-assembly
# step.
set -uo pipefail
cd "$(dirname "$0")/.."
SF="$1"; VOUT="$2"; CAP="$3"; KEYS="$4"; LOG="${5:-/tmp/hashcheck_campaign.log}"

echo "=== batch: $KEYS (cap ${CAP}s) ===" | tee -a "$LOG"
SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.Verify "$SF" "$VOUT" || { echo "VERIFY-DRIVER-FAIL $KEYS" | tee -a "$LOG"; exit 2; }
python3 tools/check_oracle.py "$SF" "$VOUT" "$CAP" 2>/dev/null | tee -a "$LOG"
RC=$?
# free the batch's dumps (keep oracle_sql.json bookkeeping files)
IFS=',' read -ra KS <<< "$KEYS"
for k in "${KS[@]}"; do rm -rf "$VOUT/${k// /}"; done
exit "$RC"
