#!/bin/bash
# TPU round checks: run when the axon TPU tunnel is up.
#   bash scripts/tpu_round_checks.sh [outdir]
# Produces, in outdir (default /tmp/tpu_checks):
#   bench_train.json       production train step (strict MFU target >= 44)
#   bench_train_dit.json / bench_train_mmdit.json
#                          transformer-backbone training MFU
#   bench_gen.json         full-song 50-step DDIM+CFG generation latency
#   bench_gen_dpm.json     the recommended dpmpp-2m@16 serving latency
#   bench_data.json        input-pipeline feed rate vs TPU consumption
#   fullsong_train_<mode>.json
#                          dim_h=512 B=1 T=65536 step per remat mode (or its
#                          OOM point) — the remat frontier at full-song length
#   cache_run1/2.json      two cold processes; compile_s run2 << run1 proves
#                          the persistent compile cache
#   aot_run1/2.json        same with BENCH_AOT=1; run2's trace_s+compile_s+
#                          warmup_s is the serving time-to-first-map
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_checks}
mkdir -p "$OUT"

run() { # name, env...
  local name=$1; shift
  echo "=== $name ($*)"
  timeout 3600 env "$@" python bench.py > "$OUT/$name.json" 2> "$OUT/$name.log"
  tail -c 400 "$OUT/$name.json"; echo
}

run bench_train  BENCH_MODE=train
# transformer backbones fit in HBM without remat at the production config
# (measured: remat only slows them — dit 27.4% -> 36.1%, mmdit 25.4% -> 31.8%)
run bench_train_dit BENCH_MODE=train BENCH_BACKBONE=dit BENCH_REMAT=0
run bench_train_mmdit BENCH_MODE=train BENCH_BACKBONE=mmdit BENCH_REMAT=0
run bench_data BENCH_MODE=data
# the full-song winner: per-level mixed (save-attn-out at the widest level);
# the uniform modes map the OOM frontier (resnet/save-attn/ff OOM at T=65536)
run fullsong_train_mixed BENCH_MODE=fullsong_train BENCH_REMAT_MODE=mixed
for mode in resnet block save-attn ff; do
  run "fullsong_train_$mode" BENCH_MODE=fullsong_train BENCH_REMAT_MODE=$mode
done
run bench_gen_dpm BENCH_MODE=gen BENCH_SAMPLER=dpmpp-2m BENCH_STEPS=16
# cache proof: fresh cache dir, two cold processes, same program
CACHE=$OUT/jax_cache
rm -rf "$CACHE"
run cache_run1 BENCH_MODE=gen OSUFUSION_JAX_CACHE="$CACHE"
run cache_run2 BENCH_MODE=gen OSUFUSION_JAX_CACHE="$CACHE"
cp "$OUT/cache_run2.json" "$OUT/bench_gen.json"
# AOT proof: run1 exports the sampler executable; run2 deserializes it —
# no Python tracing — and its trace_s+compile_s+warmup_s is the serving
# time-to-first-map (target < 15 s)
AOT=$OUT/aot_dir
rm -rf "$AOT"
run aot_run1 BENCH_MODE=gen BENCH_AOT=1 OSUFUSION_AOT_DIR="$AOT" OSUFUSION_JAX_CACHE="$CACHE"
run aot_run2 BENCH_MODE=gen BENCH_AOT=1 OSUFUSION_AOT_DIR="$AOT" OSUFUSION_JAX_CACHE="$CACHE"
echo "=== summary"
for f in "$OUT"/*.json; do
  echo "$(basename "$f"): $(head -c 300 "$f" 2>/dev/null)"
done
