"""Sustained-rate analysis from a train-driver log.

Parses the timestamped progress lines train.py emits (`[warn] iter N ...`
every 10 iters and `iter N loss ...` every 100) and reports windowed and
overall iterations/sec INCLUDING all host cadences (topology events, eval,
checkpoint saves) — the number VERDICT r2 item 2 asks for. Timestamps have
1 s resolution, so rates are computed over windows, not adjacent lines.

Usage: python scripts/log_rate.py _runs/stage3_r3g.log [--window 500]
"""
import argparse
import datetime
import re
import sys

LINE = re.compile(r"iter\s+(\d+)[^\[]*\[(\d+/\d+ \d+:\d+:\d+)\]")
PRIMS = re.compile(r"prims (\d+)")


def parse(path):
    points = []  # (iter, datetime, prims-or-None)
    year = datetime.date.today().year
    for line in open(path, errors="replace"):
        m = LINE.search(line)
        if not m:
            continue
        it = int(m.group(1))
        ts = datetime.datetime.strptime(
            f"{year}/{m.group(2)}", "%Y/%d/%m %H:%M:%S"
        )
        pm = PRIMS.search(line)
        points.append((it, ts, int(pm.group(1)) if pm else None))
    return points


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--window", type=int, default=500,
                    help="iterations per rate window")
    args = ap.parse_args()
    pts = parse(args.log)
    if len(pts) < 2:
        sys.exit("not enough progress lines")
    t0, t1 = pts[0][1], pts[-1][1]
    i0, i1 = pts[0][0], pts[-1][0]
    total_s = (t1 - t0).total_seconds()
    print(f"iters {i0}..{i1} over {total_s:.0f}s  "
          f"=> sustained {(i1 - i0) / max(total_s, 1):.2f} it/s "
          f"(all cadences included)")
    # windowed rates with the prims in effect at window end
    last = pts[0]
    for it, ts, prims in pts:
        if it - last[0] >= args.window:
            dt = (ts - last[1]).total_seconds()
            rate = (it - last[0]) / max(dt, 1)
            ptxt = f"  prims ~{prims}" if prims else ""
            print(f"  iter {last[0]:>6}..{it:<6} {rate:5.2f} it/s{ptxt}")
            last = (it, ts, prims)


if __name__ == "__main__":
    main()
