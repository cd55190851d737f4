#!/bin/bash
# Round-5 final TPU pipeline: fires when diff_res5 (192^2 fine-tune) ends.
# Production-geometry quality (VERDICT r4 #2) + the two window retries
# (DDPM-1000 bench row, 512^2 zero-shot) that hit transient tunnel crashes.
#
#   nohup bash scripts/round5_final.sh <supervisor_pid> > runs/final_r5.log 2>&1 &
set -u
cd /root/repo
SUP_PID="${1:-}"
CKPT_DIR=runs/diff_res5/checkpoints/diff_res5

echo "[fin] waiting for supervisor pid=$SUP_PID..."
if [ -n "$SUP_PID" ]; then
  while kill -0 "$SUP_PID" 2>/dev/null; do sleep 60; done
fi
echo "[fin] diff_res5 training ended at $(date -u +%H:%M:%S)"
sleep 60

BEST=$(ls -d ${CKPT_DIR}/checkpoint_best_epoch_* 2>/dev/null | grep -v tmp | sort | tail -1)
echo "[fin] best checkpoint: $BEST"
[ -z "$BEST" ] && { echo "[fin] no checkpoint; abort"; exit 1; }

echo "[fin] 1. snapshot to artifacts/diff_res5_best"
timeout 600 python scripts/snapshot_artifacts.py --checkpoint "$BEST" \
    --out artifacts/diff_res5_best

echo "[fin] 2. 192^2 val: mean-readout DDIM-50 lambda=1 single pass + sweep + oracle"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/diff_res5.yaml --checkpoint "$BEST" \
    --split val --num-samples 6 --steps 50 --init-scale 0 \
    --residual-scale-sweep --oracle --output runs/fve5_192_val_mean

echo "[fin] 3. 192^2 val: standard DDIM-50 single-sample sweep"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/diff_res5.yaml --checkpoint "$BEST" \
    --split val --num-samples 6 --steps 50 \
    --residual-scale-sweep --output runs/fve5_192_val_sample

echo "[fin] 4. 512^2 volumes, 192^2 patches: mean-readout, chunked scan (retry)"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/eval_s512.yaml --checkpoint "$BEST" \
    --split val --num-samples 4 --steps 50 --init-scale 0 \
    --sample-batch 25 --residual-scale-sweep --oracle \
    --output runs/fve5_512_mean

echo "[fin] 5. DDPM-1000 bench row (retry; chunked scan as insurance)"
sleep 60   # let the tunnel settle after the eval process exits
BENCH_SAMPLER=ddpm BENCH_QUANT=int8 BENCH_DC_SAMPLE=5 \
    timeout 5400 python bench.py 2>runs/bench_ddpm.err | tee runs/bench_ddpm.json

echo "[fin] done at $(date -u +%H:%M:%S)"
