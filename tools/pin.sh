#!/usr/bin/env bash
# Pin the round's correctness record from the BUILDER side, so an empty
# driver-side CORRECTNESS_r{N}.json can never leave a round without a hard
# signal (the round-8 failure mode: driver artifact arrived as `{}`).
#
# Runs graft.Verify at sf0.01 → /tmp/verify_out, then tools/check.py (the
# driver-gate replica: same DuckDB views, same column/row/dtype-kind
# discipline) with --json, writing CORRECTNESS_local.json at the repo root.
# Commit that file in every "pin artifacts" commit.
#
# Usage: tools/pin.sh [sf_dir] [out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_out}"
rm -rf "$OUT"
sbt -error "runMain graft.Verify $SF $OUT"
python3 tools/check.py "$SF" "$OUT" --json CORRECTNESS_local.json
