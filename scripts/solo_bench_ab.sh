#!/bin/sh
# Quick solo-chip bench A/Bs of the round-4 perf knobs (~40 min incl.
# compiles). Split out of solo_perf_r4.sh so the chip campaign can get the
# default-flip decision data BEFORE the multi-hour Stage-III legs occupy the
# chip; the heavier phase_breakdown/microbench sweeps stay in
# solo_perf_r4.sh for the post-campaign window.
set -x
cd "$(dirname "$0")/.."
OUT=_runs/perf_r4
mkdir -p "$OUT"
sh scripts/wait_backend.sh || exit 1

# round-3 baseline config (worst-case table, lex sort, no lookahead)
python bench.py | tee "$OUT/bench_r16_f32.json"

# single levers (capacity constant: ~590k slots demand at bench scale,
# measured by phase_breakdown round 3 -> 786432 budget)
python bench.py --pair_capacity 786432 | tee "$OUT/bench_compact.json"
python bench.py --pair_capacity 786432 --dma_lookahead \
  | tee "$OUT/bench_compact_lookahead.json"

# the post-densify regime (stats compiled out)
python bench.py --pair_capacity 786432 --dma_lookahead \
  --no_stats | tee "$OUT/bench_all_levers_nostats.json"

# re-capture the DEFAULT config last so the freshest bench_*.json (which
# bench.py's contended-chip fallback emits as the round artifact) is the
# headline configuration, not whichever A/B variant happened to run last;
# the identical-config compile is already cached from the first run.
python bench.py | tee "$OUT/bench_headline.json"

date > "$OUT/bench_ab_done.txt"
