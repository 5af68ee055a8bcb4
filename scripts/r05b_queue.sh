#!/bin/bash
# Round-5 second-half TPU queue: fullsong mixed-remat + re-run of block with
# the windowed fused-RoPE/dense-stats kernels, DiT/MMDiT no-remat MFU.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r05b}
mkdir -p "$OUT"

run() { # name, env...
  local name=$1; shift
  echo "=== $name ($*)"
  timeout 3600 env "$@" python bench.py > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "rc=$?"
  tail -c 500 "$OUT/$name.json"; echo
}

run fullsong_mixed BENCH_MODE=fullsong_train BENCH_REMAT_MODE=mixed \
    BENCH_REMAT_LEVELS=save-attn-out,block,block,block
run fullsong_block BENCH_MODE=fullsong_train BENCH_REMAT_MODE=block
run train_dit_noremat BENCH_MODE=train BENCH_BACKBONE=dit BENCH_REMAT=0
run train_mmdit_noremat BENCH_MODE=train BENCH_BACKBONE=mmdit BENCH_REMAT=0
echo "=== queue done"
