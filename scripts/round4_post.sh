#!/bin/bash
# Round-4 post-training pipeline: runs automatically once diff_res4 training
# finishes (supervisor process exits). Each stage is independent so a crash
# mid-pipeline loses only that stage. Logs to runs/post_round4.log.
#
#   nohup bash scripts/round4_post.sh <supervisor_pid> > runs/post_round4.log 2>&1 &
set -u
cd /root/repo
SUP_PID="${1:-}"
CFG=config/runs/diff_res4.yaml
CKPT_DIR=runs/diff_res4/checkpoints/diff_res4

echo "[post] waiting for supervisor pid=$SUP_PID to exit..."
if [ -n "$SUP_PID" ]; then
  while kill -0 "$SUP_PID" 2>/dev/null; do sleep 60; done
fi
echo "[post] training ended at $(date -u +%H:%M:%S)"
sleep 30   # let the TPU client tear down / tunnel settle

BEST=$(ls -d ${CKPT_DIR}/checkpoint_best_epoch_* 2>/dev/null | grep -v tmp | sort | tail -1)
echo "[post] best checkpoint: $BEST"
[ -z "$BEST" ] && { echo "[post] no checkpoint found; abort"; exit 1; }

echo "[post] snapshotting to artifacts/diff_res4_best"
timeout 600 python scripts/snapshot_artifacts.py --checkpoint "$BEST" \
    --out artifacts/diff_res4_best

echo "[post] val calibration sweep (DDIM-5, avg-4, oracle)"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 5 \
    --avg-samples 4 --residual-scale-sweep --oracle \
    --output runs/fve4_val_s5_avg4

LSTAR=$(python - <<'EOF'
import json
try:
    d = json.load(open("runs/fve4_val_s5_avg4.json"))
    print(d["summary"]["best_scale"])
except Exception:
    print(1.0)
EOF
)
echo "[post] calibrated residual scale lambda*=$LSTAR"

echo "[post] test-split eval at calibrated settings"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split test --num-samples 8 --steps 5 \
    --avg-samples 4 --residual-scale "$LSTAR" --oracle \
    --output runs/fve4_test_s5_avg4

echo "[post] int8 (dynamic) quality revalidation on the trained checkpoint"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 5 \
    --avg-samples 4 --residual-scale "$LSTAR" --quant int8 \
    --output runs/fve4_val_int8

echo "[post] int8_static quality revalidation"
timeout 3600 python scripts/evaluate_full_volumes.py --config $CFG \
    --checkpoint "$BEST" --split val --num-samples 8 --steps 5 \
    --avg-samples 4 --residual-scale "$LSTAR" --quant int8_static \
    --output runs/fve4_val_int8_static

echo "[post] residual-mode headline bench (512^2 geometry, random init)"
BENCH_RESIDUAL=1 timeout 5400 python bench.py > runs/bench_residual_r04.json
cat runs/bench_residual_r04.json

echo "[post] done at $(date -u +%H:%M:%S)"
