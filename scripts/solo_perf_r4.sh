#!/bin/bash
# Round-4 solo-chip performance suite: quantifies the compact pair-table
# (RasterConfig.pair_capacity) and stats-gating (viewspace_stats) levers
# against the round-3 baselines. Run ONLY on a solo chip (shared-chip probes
# time-slice behind the trainer and all configs measure identical rates —
# docs/ROUND3.md).
#
# Capacity constants: pairs_demand measured by phase_breakdown round 3 —
#   bench scale (100k g, 1000^2, r16): ~590k slots demand -> 786432 budget
#   hair scale (655k g, 512^2, r8):    ~680k slots demand -> 917504 budget
# (the breakdown prints pairs_demand; update these if the scenes change).
set -e
OUT=_runs/perf_r4
mkdir -p "$OUT"

echo "=== bench r16/f32 worst-case table (round-3 baseline config) ==="
python bench.py | tee "$OUT/bench_r16_f32.json"

echo "=== bench r16/f32 + compact table ==="
python bench.py --pair_capacity 786432 | tee "$OUT/bench_compact.json"

echo "=== bench r16/f32 + compact + no stats (post-densify regime) ==="
python bench.py --pair_capacity 786432 --no_stats \
  | tee "$OUT/bench_compact_nostats.json"

echo "=== bench r16/f32 + compact + DMA lookahead ==="
python bench.py --pair_capacity 786432 --dma_lookahead \
  | tee "$OUT/bench_compact_lookahead.json"

echo "=== bench r16/f32 + ALL levers (compact+lookahead) ==="
python bench.py --pair_capacity 786432 --dma_lookahead \
  | tee "$OUT/bench_all_levers.json"

echo "=== breakdown bench scale, worst-case + binning sub-phases ==="
python scripts/phase_breakdown.py --iters 10 --bin_phases \
  | tee "$OUT/breakdown_bench.json"

echo "=== breakdown bench scale, compact ==="
python scripts/phase_breakdown.py --iters 10 --pair_capacity 786432 \
  | tee "$OUT/breakdown_bench_compact.json"

echo "=== breakdown hair scale, worst-case (round-3 comparison point) ==="
python scripts/phase_breakdown.py --n_gaussians 655360 --width 512 \
  --height 512 --max_tiles 8 --max_pairs 1024 --feat_bf16 --iters 10 \
  --aniso --scale_lo 3e-4 --bin_phases | tee "$OUT/breakdown_hair.json"

echo "=== breakdown hair scale, compact ==="
python scripts/phase_breakdown.py --n_gaussians 655360 --width 512 \
  --height 512 --max_tiles 8 --max_pairs 1024 --feat_bf16 --iters 10 \
  --aniso --scale_lo 3e-4 --pair_capacity 917504 \
  | tee "$OUT/breakdown_hair_compact.json"

echo "=== breakdown hair scale, compact + no stats ==="
python scripts/phase_breakdown.py --n_gaussians 655360 --width 512 \
  --height 512 --max_tiles 8 --max_pairs 1024 --feat_bf16 --iters 10 \
  --aniso --scale_lo 3e-4 --pair_capacity 917504 --no_stats \
  | tee "$OUT/breakdown_hair_compact_nostats.json"

echo "=== kernel-only microbench: lookahead + tps sweep at hair-like skew ==="
python scripts/kernel_microbench.py --grid 32 --mean_chunks 4 \
  --max_pairs 2048 --tps 16 32 64 --lookahead both \
  | tee "$OUT/kernel_microbench.jsonl"

echo "=== DONE ==="
