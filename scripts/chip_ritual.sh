#!/usr/bin/env bash
# Round-3 on-chip ritual — run the moment the axon tunnel is back.
# Every step logs to $LOGDIR and keeps going on failure so one flaky
# stage doesn't lose the session.  Order: cheap smoke first, then the
# headline bench (+ TILE sweep), then the long prove/verify/cold battery.
set -u
LOGDIR=${LOGDIR:-/tmp/chip_r3}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc tail:"; tail -5 "$LOGDIR/$name.log"
  return $rc
}

# 0. tunnel smoke (fail fast if it's down again)
step smoke 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. on-chip kernel suite (11 tests) + the MXU twin boundary tests
step pallas_tests 1800 env ZINC_TPU_TEST_TPU=1 python -m pytest \
  tests/test_pallas_kernels.py tests/test_mxu_twins.py -q

# 2. headline bench (Gruen + redc-tail fused round), default TILE=256
step bench_t256 900 python bench.py

# 3. TILE sweep with raised scoped VMEM (values proof-identical)
step bench_t512 900 env ZINC_TPU_MXU_TILE=512 \
  LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 python bench.py
step bench_t1024 900 env ZINC_TPU_MXU_TILE=1024 \
  LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=131072 python bench.py

# 4. warm 2^20 prove x4 with stage splits (VERDICT r2 item 3)
step prove 3600 env ZINC_TPU_TRACE=1 python scripts/chip_measure.py prove

# 5. warm 2^20 verify x3 with stage splits (item 4)
step verify 3600 env ZINC_TPU_TRACE=1 python scripts/chip_measure.py verify

# 6. cold-start fresh-process prove (item 6; export cache + XLA cache)
step cold 3600 env ZINC_TPU_TRACE=1 python scripts/chip_measure.py cold

echo "=== ritual done; logs in $LOGDIR ==="
grep -h '"metric"' "$LOGDIR"/bench_*.log 2>/dev/null
