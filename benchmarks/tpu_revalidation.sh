#!/bin/bash
# Round-3 TPU revalidation: everything that was blocked on the axon tunnel
# outage, in dependency order. Run from the repo root when the tunnel is back
# (the /tmp/tpu_up watcher, or `timeout 120 python -c "import jax; jax.devices()"`).
#
#   bash benchmarks/tpu_revalidation.sh [logfile]
#
# Order matters: the cheap compile check first (fail fast if the tunnel is
# lying), then the numeric sweep (correctness gates perf — the merged-entry
# lowering is the sweep's `flagship_semantics` row, since merge_residual_entry
# defaults ON, with `flagship_unmerged_entry` as the isolation pair; if the
# PAIR diverges, do NOT keep merge_entry default-ON, whatever the A/B says),
# then the FusionStack A/Bs, then the full bench.
# Each step gets its own timeout; the remote compile helper slows down over a
# session (CLAUDE.md), so later steps get bigger budgets.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_reval.log}"
: > "$LOG"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  return $rc
}

run entry_compile 900 python -c "import jax, __graft_entry__ as g; f,a=g.entry(); print('entry out', jax.jit(f)(*a).shape)" \
  || { echo "entry() compile FAILED — tunnel not usable, aborting" | tee -a "$LOG"; exit 1; }

run numeric_sweep 5400 python benchmarks/tpu_numeric_sweep.py
SWEEP_RC=$?

# The training BACKWARD on the chip (VERDICT r4 item 2): gradients of the
# combined loss through the train-mode forward, CPU-golden vs TPU — includes
# the Pallas windowed-attention custom VJP, which only executes on TPU.
run grad_check 5400 python benchmarks/tpu_grad_check.py
GRAD_RC=$?

run ab_fusion_stack 3600 python benchmarks/ab_fusion_stack.py

run bench 3600 python bench.py

echo "=== summary ===" | tee -a "$LOG"
grep -E "rc=|REL_L2|rel_l2|PASS|FAIL|speedup|\"metric\"" "$LOG" | tail -60
[ $SWEEP_RC -ne 0 ] && echo "NUMERIC SWEEP FAILED — investigate before touching merge_entry defaults"
[ $GRAD_RC -ne 0 ] && echo "GRAD CHECK FAILED — the TPU backward diverges from CPU golden; treat as a miscompile until localized"
exit 0
