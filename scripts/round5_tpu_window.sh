#!/bin/bash
# Round-5 single-chip TPU window: runs after round5_post.sh's quality evals.
# Ceilings at both geometries, zero-shot production-geometry eval, the bench
# family (encode-batch fix, int8_static+int8-VAE candidate default, attn-int8
# decision point, DDIM-20 + DDPM-1000 published rows, profiler trace).
#
#   nohup bash scripts/round5_tpu_window.sh > runs/tpu_window_r5.log 2>&1 &
set -u
cd /root/repo
CKPT=artifacts/diff_res4_best

echo "[win] A1. residual-VAE ceiling at 96^2 (diff_res4 geometry)"
timeout 1200 python scripts/residual_vae_ceiling.py \
    --config config/runs/diff_res4.yaml --vae artifacts/vae_res3_best \
    --num-patches 16 --batch 4 --output runs/ceiling_96

echo "[win] A2. residual-VAE ceiling at 192^2 (production patch geometry)"
timeout 1200 python scripts/residual_vae_ceiling.py \
    --config config/runs/diff_res5.yaml --vae artifacts/vae_res3_best \
    --num-patches 8 --batch 2 --output runs/ceiling_192

echo "[win] B. zero-shot production-geometry eval (512^2 volumes, 192^2 patches)"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/eval_s512.yaml --checkpoint $CKPT \
    --split val --num-samples 4 --steps 50 \
    --residual-scale-sweep --oracle --output runs/fve5_512_zeroshot

echo "[win] B2. conditional-mean readout: DDIM-50, init-scale 0, single pass"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/diff_res4.yaml --checkpoint $CKPT \
    --split val --num-samples 8 --steps 50 --init-scale 0 \
    --residual-scale-sweep --output runs/fve5_val_s50_mean

echo "[win] B3. DDIM-1 diagnostic (one-step x0 anchor quality)"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/diff_res4.yaml --checkpoint $CKPT \
    --split val --num-samples 8 --steps 1 \
    --residual-scale-sweep --output runs/fve5_val_s1

echo "[win] C0. int8s + int8-VAE quality eval on the trained checkpoint (96^2)"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/diff_res4.yaml --checkpoint $CKPT \
    --split val --num-samples 8 --steps 50 \
    --quant int8_static --quant-vae int8 --output runs/fve5_val_s50_int8s_vae

echo "[win] B4. test split at the calibrated production recipe (DDIM-5 avg-4, lambda* from val)"
LSTAR=$(python3 -c "import json; print(json.load(open('runs/fve5_val_s5_avg4.json'))['summary'].get('best_scale', 1.0))" 2>/dev/null || echo 1.0)
echo "[win] lambda* (val, avg-4) = $LSTAR"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/diff_res4.yaml --checkpoint $CKPT \
    --split test --num-samples 8 --steps 5 --avg-samples 4 \
    --residual-scale "$LSTAR" --oracle --output runs/fve5_test_s5_avg4

echo "[win] B5. test split at the mean-readout recipe (DDIM-50 init-scale 0, lambda=1)"
timeout 3600 python scripts/evaluate_full_volumes.py \
    --config config/runs/diff_res4.yaml --checkpoint $CKPT \
    --split test --num-samples 8 --steps 50 --init-scale 0 \
    --output runs/fve5_test_s50_mean

echo "[win] C1. bench: current default + encode-batch fix"
BENCH_DC_ENC=25 timeout 2400 python bench.py 2>runs/bench_c1.err | tee runs/bench_c1.json

echo "[win] C2. bench: int8_static + int8 VAE decode + encode-batch (candidate default)"
BENCH_QUANT=int8_static BENCH_QUANT_VAE=int8 BENCH_DC_ENC=25 \
    timeout 3000 python bench.py 2>runs/bench_c2.err | tee runs/bench_c2.json

echo "[win] C3. bench: + int8 attention matmuls (adopt-or-delete measurement)"
BENCH_QUANT=int8_static BENCH_QUANT_VAE=int8 BENCH_DC_ENC=25 BENCH_QUANT_ATTN=1 \
    timeout 3000 python bench.py 2>runs/bench_c3.err | tee runs/bench_c3.json

echo "[win] C4. bench: DDIM-20 published row"
BENCH_STEPS=20 BENCH_QUANT=int8_static BENCH_QUANT_VAE=int8 BENCH_DC_ENC=25 \
    timeout 2400 python bench.py 2>runs/bench_c4.err | tee runs/bench_c4.json

echo "[win] C5. bench: DDPM-1000 published row"
BENCH_SAMPLER=ddpm BENCH_QUANT=int8 BENCH_DC_ENC=25 \
    timeout 3600 python bench.py 2>runs/bench_c5.err | tee runs/bench_c5.json

echo "[win] C6. bench: profiler trace of the headline configuration"
BENCH_DC_ENC=25 BENCH_PROFILE=runs/trace_r5 timeout 2400 python bench.py \
    2>runs/bench_c6.err | tee runs/bench_c6.json
python scripts/summarize_trace.py runs/trace_r5 --top 25 > runs/trace_r5_summary.txt || true
tail -30 runs/trace_r5_summary.txt

echo "[win] done at $(date -u +%H:%M:%S)"
