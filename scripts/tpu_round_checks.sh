#!/bin/bash
# TPU round checks: run when the axon TPU tunnel is up.
#   bash scripts/tpu_round_checks.sh [outdir]
# Produces, in outdir (default /tmp/tpu_checks):
#   bench_train.json      production train step (strict MFU must be >= 40)
#   bench_gen.json        full-song 50-step DDIM+CFG generation latency
#   fullsong_train.json   one dim_h=512 B=1 T=65536 train step (or its OOM point)
#   cache_run1.json / cache_run2.json
#                         two cold processes; compile_s in run2 << run1 proves
#                         the persistent compile cache works on the TPU backend
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
run fullsong_train BENCH_MODE=fullsong_train
run bench_gen_dpm BENCH_MODE=gen BENCH_SAMPLER=dpmpp-2m BENCH_STEPS=16
# cache proof: fresh cache dir, two cold processes, same program
CACHE=$OUT/jax_cache
rm -rf "$CACHE"
run cache_run1 BENCH_MODE=gen OSUFUSION_JAX_CACHE="$CACHE"
run cache_run2 BENCH_MODE=gen OSUFUSION_JAX_CACHE="$CACHE"
cp "$OUT/cache_run2.json" "$OUT/bench_gen.json"
echo "=== summary"
for f in bench_train fullsong_train cache_run1 cache_run2; do
  echo "$f: $(cat "$OUT/$f.json" 2>/dev/null | head -c 300)"
done
