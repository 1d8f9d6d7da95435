#!/usr/bin/env python
"""Read the solo bench A/B artifacts (scripts/solo_bench_ab.sh) and print a
decision table for the round-4 perf-knob defaults.

The knobs shipped default-off pending solo-chip data (CLAUDE.md round-4
state): --pair_capacity (compact paged pair table),
--dma_lookahead. A knob is recommended ON when its single-lever A/B beats
the round-3 baseline config by >3% (beyond shared-chip noise; these are
solo artifacts, but compile-cache and clock jitter still wiggle ~1-2%) AND
the on-TPU parity gate PASSed (bit-identity of the compact/bucket/lookahead
paths is part of scripts/tpu_parity_check.py).

Usage: python scripts/decide_knob_defaults.py [_runs/perf_r4]
"""

import glob
import json
import os
import sys


def read_bench(path):
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    d = json.loads(line)
                    if "value" in d:
                        return float(d["value"])
    except (OSError, ValueError):
        return None
    return None


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "_runs/perf_r4"
    names = {
        "baseline (r3 defaults)": "bench_r16_f32.json",
        "compact table": "bench_compact.json",
        "compact+bucket": "bench_compact_bucket.json",
        "compact+lookahead": "bench_compact_lookahead.json",
        "all levers": "bench_all_levers.json",
        "all levers, no stats": "bench_all_levers_nostats.json",
        "headline recapture": "bench_headline.json",
    }
    vals = {}
    for label, fname in names.items():
        v = read_bench(os.path.join(out, fname))
        vals[label] = v
        print(f"{label:26s} {v if v is not None else '---'}")

    parity_path = os.path.join(out, "parity.txt")
    parity_ok = False
    if os.path.exists(parity_path):
        with open(parity_path) as f:
            parity_ok = any(line.startswith("PASS") for line in f)
    print(f"parity gate: {'PASS' if parity_ok else 'NOT PASSED'}")

    base = vals.get("baseline (r3 defaults)")
    if base is None:
        print("no baseline artifact yet — run scripts/solo_bench_ab.sh first")
        return 1
    print()
    decisions = []
    for label, flag in [
        ("compact table", "pair_capacity adaptive (0)"),
        ("compact+lookahead", "dma_lookahead=True"),
    ]:
        v = vals.get(label)
        if v is None:
            print(f"{flag}: NO DATA")
            continue
        rel = v / base - 1.0
        on = rel > 0.03 and parity_ok
        decisions.append((flag, on, rel))
        print(f"{flag}: {'FLIP ON' if on else 'keep off'} "
              f"({rel * 100:+.1f}% vs baseline"
              f"{'' if parity_ok else ', parity unproven'})")
    allv = vals.get("all levers")
    if allv is not None:
        print(f"all levers combined: {allv / base - 1.0:+.1%} vs baseline")
    nostats = vals.get("all levers, no stats")
    if nostats is not None and allv:
        print(f"stats gating on top: {nostats / allv - 1.0:+.1%} "
              f"(auto-applied past densify_until_iter already)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
