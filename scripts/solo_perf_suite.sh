#!/bin/bash
# End-of-round solo-chip performance suite. Run ONLY when no training run
# shares the chip (shared-chip probes time-slice with the trainer and all
# configs measure identical — see docs/ROUND3.md).
#
# Produces, under _runs/perf_r3/:
#   bench_r16_f32.json      default-fidelity headline (BENCH config)
#   bench_r8_bf16.json      aggressive config
#   bench_r16_f32_c256.json chunk sweep point
#   breakdown_bench.json    phase + roofline at bench scale
#   breakdown_hair.json     phase + roofline at Stage-III scale
set -e
OUT=_runs/perf_r3
mkdir -p "$OUT"

echo "=== pallas-vs-XLA parity on TPU (kernel changes gate) ==="
python scripts/tpu_parity_check.py | tee "$OUT/parity.txt"

# Ordered most-critical-first so a round-end cutoff loses only sweep points:
# headline bench and the roofline breakdowns are the judged artifacts.
echo "=== bench r16/f32 (default fidelity) ==="
python bench.py | tee "$OUT/bench_r16_f32.json"

echo "=== phase breakdown (bench scale, r16/f32) ==="
python scripts/phase_breakdown.py --iters 10 \
  | tee "$OUT/breakdown_bench.json"

echo "=== bench r8 + bf16 ==="
python bench.py --max_tiles 8 --feat_bf16 | tee "$OUT/bench_r8_bf16.json"

echo "=== phase breakdown (hair scale, r8/bf16) ==="
python scripts/phase_breakdown.py --n_gaussians 655360 --width 512 \
  --height 512 --max_tiles 8 --max_pairs 1024 --feat_bf16 --iters 10 \
  --aniso --scale_lo 3e-4 | tee "$OUT/breakdown_hair.json"

echo "=== bench r16/f32 chunk=256 ==="
python bench.py --chunk 256 | tee "$OUT/bench_r16_f32_c256.json"

# tiles_per_step sweep: shared-chip probes could not distinguish tps configs
# (every variant time-sliced to the same rate behind the trainer); only a
# solo chip can (docs/ROUND3.md).
echo "=== bench r16/f32 tps=16 ==="
python bench.py --tiles_per_step 16 | tee "$OUT/bench_r16_f32_tps16.json"

echo "=== bench r16/f32 tps=64 ==="
python bench.py --tiles_per_step 64 | tee "$OUT/bench_r16_f32_tps64.json"

echo "=== DONE ==="
