#!/bin/bash
# Round-4 on-hardware sweep: run everything that needs the TPU tunnel, in
# priority order, saving outputs under /tmp/r4_hw/.  Safe to re-run; each
# stage is skipped if its output already exists (delete to redo).
#
#   bash scripts/r4_hw_sweep.sh            # all stages
#   bash scripts/r4_hw_sweep.sh bench      # one stage
#
# DECISION TREE once outputs exist (the tunnel may not stay up long, so the
# stages are ordered by decision value):
#   bench        -> commit BENCH_LAST_GOOD.json immediately (ship gate).
#   ab_dense     -> if configs 2/5 beat the defaults AND parity_dense PASSes,
#                   flip MICROALIGNER_TPU_FLOW_DENSE default to auto
#                   (dense when >=2 tiles), set FLOW_DENSE=0 in the
#                   strict-parity tests, document in PARITY.md, re-run bench,
#                   re-commit the snapshot.
#   ab_dense_rbf16 / ab_rbf16_speed + parity_rbf16 -> if sweep all-PASS and
#                   speed helps, gate R0/R1 bf16 like _m_storage_dtype
#                   (default on for win >= threshold); else delete the knob.
#   ab_static_split / ab_batch* -> best tiled-path config becomes the
#                   default _TILE_BATCH / static_split (only matters if the
#                   tiled path stays the default anywhere).
#   profile_20k / profile_feature -> attribute remaining gaps; feed the next
#                   kernel fix.  Record all numbers in BASELINE.md (canonical)
#                   and ARCHITECTURE.md's attribution section.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_hw
mkdir -p "$OUT"
STAGE="${1:-all}"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.out" ]; then echo "== $name: exists, skip"; return; fi
  echo "== $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2>&1
  echo "   rc=$? ($(wc -l < "$OUT/$name.out") lines)"
}

# 1. the ship-gate: full bench incl. e2e CLI config (writes BENCH_LAST_GOOD.json)
[ "$STAGE" = all ] || [ "$STAGE" = bench ] && \
  run bench 1500 env MICROALIGNER_BENCH_BUDGET_S=900 python bench.py

# 2. the round-4 candidate: full-width row-band dense flow (configs 2,3,4,5)
[ "$STAGE" = all ] || [ "$STAGE" = dense ] && {
  run ab_dense 1500 env MICROALIGNER_TPU_FLOW_DENSE=1 python bench.py --only 2,3,4,5
  run parity_dense 1500 python scripts/tpu_parity_check.py --dense
  # dense + bf16 R0/R1 combined — the expected production configuration
  run ab_dense_rbf16 1500 env MICROALIGNER_TPU_FLOW_DENSE=1 MICROALIGNER_TPU_R_BF16=1 python bench.py --only 2,3,4,5
}

# 3. A/B knobs on the tiled path (VERDICT item 8)
[ "$STAGE" = all ] || [ "$STAGE" = knobs ] && {
  run ab_static_split 1200 env MICROALIGNER_BENCH_BUDGET_S=900 MICROALIGNER_TPU_FLOW_STATIC_SPLIT=1 python bench.py --only 5
  run ab_batch8  1200 env MICROALIGNER_BENCH_BUDGET_S=900 MICROALIGNER_TPU_FLOW_TILE_BATCH=8  python bench.py --only 5
  run ab_batch32 1200 env MICROALIGNER_BENCH_BUDGET_S=900 MICROALIGNER_TPU_FLOW_TILE_BATCH=32 python bench.py --only 5
  # bf16 R0/R1 SPEED effect (fresh process: the knob is trace-time-read);
  # accuracy is judged by the rbf16 parity stage below
  run ab_rbf16_speed 1500 env MICROALIGNER_BENCH_BUDGET_S=900 MICROALIGNER_TPU_R_BF16=1 python bench.py --only 2,5
}

# 4. attribute the 20k 231->109 Mpix/s drop
[ "$STAGE" = all ] || [ "$STAGE" = p20k ] && \
  run profile_20k 1800 python scripts/profile_20k.py

# 5. feature engine stage profile (dense path)
[ "$STAGE" = all ] || [ "$STAGE" = pfeat ] && \
  run profile_feature 1200 python scripts/profile_feature.py

# 6. bf16 R0/R1 parity sweep (VERDICT item 6)
[ "$STAGE" = all ] || [ "$STAGE" = rbf16 ] && \
  run parity_rbf16 1500 env MICROALIGNER_TPU_R_BF16=1 python scripts/tpu_parity_check.py --sweep

echo "all requested stages done; outputs in $OUT"
