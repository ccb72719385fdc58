#!/usr/bin/env bash
# On-chip ritual (round 5) — run whenever the axon tunnel is up.
# Every step logs to $LOGDIR and keeps going on failure so one flaky
# stage doesn't lose the session.  Order: cheap smoke first, then the
# headline bench (+ TILE sweep), then the long prove/verify/cold battery.
#
# Round-3 post-mortem baked in: the TILE-sweep steps timed out at 900 s
# mid-compile (fresh kernel shapes + a changed LIBTPU flag invalidate the
# persistent compile cache) and the prove battery timed out at 3600 s on
# first-run traces — timeouts are now sized for cold compiles, and every
# step records its exit code in $LOGDIR/STATUS.
set -u
LOGDIR=${LOGDIR:-/tmp/chip_r4}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
: >"$LOGDIR/STATUS"

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "$name exit=$rc" >>"$LOGDIR/STATUS"
  echo "--- $name exit=$rc tail:"; tail -5 "$LOGDIR/$name.log"
  return $rc
}

# 0. tunnel smoke (fail fast if it's down again)
step smoke 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. on-chip kernel suite (11 tests) + the MXU twin boundary tests
step pallas_tests 2400 env ZINC_TPU_TEST_TPU=1 python -m pytest \
  tests/test_pallas_kernels.py tests/test_mxu_twins.py -q

# 2. headline bench (Gruen + redc-tail fused round); bench.py defaults to
#    TILE=1024 on the chip (the r4 sweep winner), per-kernel VMEM budget —
#    no libtpu flag needed.
step bench 2400 python bench.py

# 3. TILE sweep (values proof-identical).  Cold-compile-sized timeouts:
#    a fresh tile size is a fresh Mosaic compile (~2-6 min per kernel).
step bench_t256 2400 env ZINC_TPU_MXU_TILE=256 python bench.py
step bench_t512 2400 env ZINC_TPU_MXU_TILE=512 python bench.py

# 4. warm 2^20 prove x4 with stage splits (VERDICT r2 item 3)
step prove 10800 env ZINC_TPU_TRACE=1 python scripts/chip_measure.py prove

# 5. warm 2^20 verify x3 with stage splits (item 4)
step verify 7200 env ZINC_TPU_TRACE=1 python scripts/chip_measure.py verify

# 6. cold-start fresh-process prove (item 6; export cache + XLA cache)
step cold 7200 env ZINC_TPU_TRACE=1 python scripts/chip_measure.py cold

# 6b. cold fresh-process VERIFY (r5: production verifier bring-up)
step coldverify 7200 python scripts/chip_measure.py coldverify

# 7. sharded tier on the real chip (VERDICT r3 item 5): 1-device-mesh
#    round vs unsharded round (shard_map overhead) + one-sync FS wall
step sharded 7200 python scripts/chip_measure.py sharded

echo "=== ritual done; logs in $LOGDIR ==="
cat "$LOGDIR/STATUS"
grep -h '"metric"' "$LOGDIR"/bench_*.log 2>/dev/null

# consistency: PERF.md's headline must match the latest driver record
latest=$(ls BENCH_r*.json 2>/dev/null | sort | tail -1)
if [ -n "$latest" ]; then
  val=$(python - "$latest" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print((d.get("parsed") or d)["value"])
EOF
  )
  if grep -q "$val" PERF.md; then
    echo "PERF.md consistent with $latest (value $val)"
  else
    echo "WARNING: PERF.md does not cite $latest value $val — fix before committing"
  fi
fi
