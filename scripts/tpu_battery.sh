#!/usr/bin/env bash
# One-shot TPU validation battery (the round's hardware acceptance run).
# Mirrors the reference's tool_test.sh umbrella (scripts/tool_test.sh):
# run everything that needs the real chip, log per-leg, keep going on
# failure, summarize at the end. Designed to be launched the moment the
# tunneled backend comes back after an outage.
#
# Usage: bash scripts/tpu_battery.sh [logdir]   (default .claude/battery)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-.claude/battery}"
mkdir -p "$LOG"
SUMMARY="$LOG/summary.txt"
: > "$SUMMARY"

leg() {  # leg <name> <timeout-s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  local t0=$SECONDS
  # -k 30: SIGTERM can be ineffective against a process stuck in
  # uninterruptible tunnel I/O (the documented hang mode this battery
  # exists for) — escalate to SIGKILL so one hung leg cannot stall the rest
  timeout -k 30 "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  printf '%-24s rc=%-3s %4ss\n' "$name" "$rc" "$dt" | tee -a "$SUMMARY"
  return $rc
}

# 0. liveness gate: do not burn the battery on a dead tunnel
leg probe 180 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); print(float((x+1).sum()), jax.devices())" \
  || { echo "backend dead; aborting battery" | tee -a "$SUMMARY"; exit 1; }

# 1. hello walkthrough (4 TPPs end-to-end on chip)
leg hello 600 python samples/hello.py

# 2. full test suite on hardware (cold compiles; ~30 min warm-cache)
leg pytest 3600 env XSMM_TESTS_TPU=1 python -m pytest tests/ -q

# 3. xgemm full acceptance matrix -> refreshes XGEMM_FULL.json for bench
leg xgemm_full 3600 python samples/xgemm.py --full

# 4. benchmark headline + extras (writes the one JSON line)
leg bench 5400 python bench.py
grep -h '^{' "$LOG/bench.log" | tail -1 > "$LOG/bench.json" 2>/dev/null || true
# bench.py exits 0 even when it found the backend dead (it emits an honest
# error artifact for the round harness) — the BATTERY must still count
# that as a failed leg, or a mid-battery outage reads as a pass
if grep -q '"error"' "$LOG/bench.json" 2>/dev/null; then
  echo "bench artifact carries an error (backend died mid-battery)" \
    | tee -a "$SUMMARY"
  printf '%-24s rc=%-3s %4ss\n' "bench_artifact" 1 0 | tee -a "$SUMMARY"
fi

# 5. PyFR fsspmdm sweep on the real reference operators
leg pyfr 1200 python samples/pyfr.py

# 6. smmbench streaming taxonomy
leg smmbench 900 python samples/smmbench.py

echo; echo "battery summary:"; cat "$SUMMARY"
fails=$(awk '$2 != "rc=0" {n++} END {print n+0}' "$SUMMARY")
echo "legs failed: $fails"
exit "$fails"
