#!/bin/bash
# One-shot queue of the TPU measurements that were pending the round-3
# tunnel outage (BENCH_NOTES.md). Runs strictly ONE job at a time (the
# tunnel wedges machine-wide under concurrent/killed clients — CLAUDE.md),
# probes the device between steps, and stops the whole queue on the first
# failure instead of hammering a sick tunnel.
#
# Usage: bash tools/tpu_ab_queue.sh [LOGDIR]   (default /tmp/tpu_ab)
# Old-side worktree for the solver A/B is expected at /tmp/ab_old
# (commit 2cea002, staged before the outage).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${1:-/tmp/tpu_ab}"
OLD=/tmp/ab_old
mkdir -p "$LOG"

probe() {
  timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); (x @ x).block_until_ready()
print("probe ok:", jax.devices())
EOF
}

step() {  # step NAME DIR TIMEOUT CMD...
  local name="$1" dir="$2" t="$3"; shift 3
  echo "=== $name ($(date)) ===" | tee -a "$LOG/queue.log"
  if ! probe >> "$LOG/queue.log" 2>&1; then
    echo "!!! device probe failed before $name — stopping queue" | tee -a "$LOG/queue.log"
    exit 1
  fi
  if ! (cd "$dir" && timeout "$t" "$@" > "$LOG/$name.log" 2>&1); then
    echo "!!! $name failed/timed out (see $LOG/$name.log) — stopping queue" | tee -a "$LOG/queue.log"
    exit 1
  fi
  echo "--- $name done ($(date))" | tee -a "$LOG/queue.log"
}

# 1) solver latency rework A/B (new Cholesky+folded-K vs old LU at 2cea002)
step solver_new "$REPO" 1200 python tools/solver_bench.py --batch 64
[ -d "$OLD" ] && step solver_old "$OLD" 1200 python tools/solver_bench.py --batch 64
step fused_new "$REPO" 1200 python bench.py 128 20
[ -d "$OLD" ] && step fused_old "$OLD" 1200 python bench.py 128 20

# 2) corner-gather layout probe + train-step A/B (ship decision)
step gather_probe "$REPO" 1200 python tools/gather_layout_probe.py --batch 12
step train_gather_b_outside "$REPO" 1800 python tools/train_bench.py --batches 12,64 --iters 10
step train_gather_b_inside "$REPO" 1800 python tools/train_bench.py --batches 12,64 --iters 10 --batch-inside-gather

# 3) CLI f32-vs-bf16 train-step A/B (the --bf16 flag's TPU numbers)
step train_f32 "$REPO" 1800 python tools/train_bench.py --batches 12 --iters 10 --dtype f32

# 4) training-step backward per-op profile (VERDICT r2 #3d)
step train_profile "$REPO" 1800 python tools/train_bench.py --batches 64 --iters 5 --profile "$LOG/train_trace"
step parse_trace "$REPO" 600 python tools/parse_trace.py "$LOG/train_trace" 40

echo "=== queue complete ($(date)) ===" | tee -a "$LOG/queue.log"
