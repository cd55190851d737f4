#!/bin/bash
# Round-5 post-training pipeline: fires once diff_res4 training finishes
# (supervisor pid exits). The decisive measurement is stage 2: DDIM-50,
# lambda=1, SINGLE-sample generation vs the trilinear floor on the val split
# (VERDICT r4 next #1) — the sweep re-scores the same generation at other
# lambdas for free (generation is affine in the decoded residual).
#
#   nohup bash scripts/round5_post.sh <supervisor_pid> > runs/post_round5.log 2>&1 &
set -u
cd /root/repo
SUP_PID="${1:-}"
CFG=config/runs/diff_res4.yaml
CKPT_DIR=runs/diff_res4/checkpoints/diff_res4

echo "[post5] waiting for supervisor pid=$SUP_PID to exit..."
if [ -n "$SUP_PID" ]; then
  while kill -0 "$SUP_PID" 2>/dev/null; do sleep 60; done
fi
echo "[post5] training ended at $(date -u +%H:%M:%S)"
sleep 30

BEST=$(ls -d ${CKPT_DIR}/checkpoint_best_epoch_* 2>/dev/null | grep -v tmp | sort | tail -1)
echo "[post5] best checkpoint: $BEST"
[ -z "$BEST" ] && { echo "[post5] no checkpoint found; abort"; exit 1; }

echo "[post5] 1. snapshot to artifacts/diff_res4_best"
timeout 600 python scripts/snapshot_artifacts.py --checkpoint "$BEST" \
    --out artifacts/diff_res4_best

echo "[post5] 2. DECISIVE: val DDIM-50 single-sample, lambda sweep + oracle"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 50 \
    --residual-scale-sweep --oracle --output runs/fve5_val_s50

echo "[post5] 3. val DDIM-5 single-sample sweep (steps dependence)"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 5 \
    --residual-scale-sweep --output runs/fve5_val_s5

echo "[post5] 4. val DDIM-5 avg-4 sweep (conditional-mean readout)"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 5 \
    --avg-samples 4 --residual-scale-sweep --output runs/fve5_val_s5_avg4

echo "[post5] 5. test split at DDIM-50 lambda=1 single-sample + oracle"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split test --num-samples 8 --steps 50 \
    --oracle --output runs/fve5_test_s50

echo "[post5] 6. int8 paired val eval (DDIM-50 lambda=1 single-sample)"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 50 \
    --quant int8 --output runs/fve5_val_s50_int8

echo "[post5] 7. int8_static paired val eval"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 50 \
    --quant int8_static --output runs/fve5_val_s50_int8s

echo "[post5] done at $(date -u +%H:%M:%S)"
