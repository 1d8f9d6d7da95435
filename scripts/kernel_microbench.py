#!/usr/bin/env python
"""Kernel-only timing of the pallas compositor (fwd and bwd), isolated from
the XLA prep/binning/routing that phase_breakdown measures around it.

Builds a synthetic chunk-aligned paged pair table directly (no binning), so
the measured program is exactly: one composite_pairs forward, or its
forward+custom-VJP backward. Sweeps the scheduling knobs that cannot be
separated inside a full train step: dma_lookahead, tiles_per_step, chunk.

Run SOLO on the chip; every timed call jitters the geometry rows (the axon
platform serves identical executions from cache). Prints one JSON line per
config.

Table shape mirrors the hair-scale regime by default: 1024 tiles (512^2),
mean pairs/tile set by --mean_chunks with a long-tailed skew, opacity tuned
so early exit triggers realistically partway into deep tiles.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_table(nt, mean_chunks, max_chunks, chunk, c_pad, seed=0):
    rng = np.random.default_rng(seed)
    # long-tailed per-tile chunk counts in [0, max_chunks]
    raw = rng.gamma(shape=1.2, scale=mean_chunks / 1.2, size=nt)
    nchunks = np.clip(np.round(raw), 0, max_chunks).astype(np.int32)
    counts = nchunks * chunk
    # realistic partial last chunks
    partial = rng.integers(0, chunk, size=nt).astype(np.int32)
    counts = np.maximum(counts - (nchunks > 0) * partial, 0)
    padded = ((counts + chunk - 1) // chunk) * chunk
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int32)
    p_pad = int(padded.sum() + chunk)

    # geometry rows: gaussians centered inside their tile with a few-pixel
    # footprint and mid opacity — deep tiles saturate partway (real
    # early-exit behavior), shallow tiles do not
    geo = np.zeros((8, p_pad), np.float32)
    tile_of_slot = np.zeros(p_pad, np.int32)
    for t in range(nt):
        tile_of_slot[starts[t]:starts[t] + padded[t]] = t
    tx = (tile_of_slot % 32) * 16
    ty = (tile_of_slot // 32) * 16
    geo[0] = tx + rng.uniform(0, 16, p_pad)
    geo[1] = ty + rng.uniform(0, 16, p_pad)
    geo[2] = rng.uniform(0.05, 0.3, p_pad)   # conic a
    geo[3] = rng.uniform(-0.02, 0.02, p_pad)  # conic b
    geo[4] = rng.uniform(0.05, 0.3, p_pad)   # conic c
    geo[5] = rng.uniform(0.1, 0.5, p_pad)    # opacity
    # zero the per-tile padding slots and the spare chunk
    live = np.zeros(p_pad, bool)
    for t in range(nt):
        live[starts[t]:starts[t] + counts[t]] = True
    geo[:, ~live] = 0.0
    feat = rng.uniform(0, 1, (c_pad, p_pad)).astype(np.float32)
    feat[:, ~live] = 0.0
    return geo, feat, starts, counts.astype(np.int32), p_pad


def main():
    import jax
    import jax.numpy as jnp

    from hairgs_tpu.render.pallas_composite import composite_pairs

    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=32, help="grid_w = grid_h")
    p.add_argument("--mean_chunks", type=float, default=4.0)
    p.add_argument("--max_pairs", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--channels", type=int, default=7)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--tps", type=int, nargs="*", default=[32])
    p.add_argument("--lookahead", type=str, default="both",
                   choices=["off", "on", "both"])
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    gw = gh = args.grid
    nt = gw * gh
    max_chunks = args.max_pairs // args.chunk
    c_pad = ((args.channels + 7) // 8) * 8
    geo, feat, starts, counts, p_pad = build_table(
        nt, args.mean_chunks, max_chunks, args.chunk, c_pad)
    geo = jnp.asarray(geo)
    feat = jnp.asarray(feat)
    starts = jnp.asarray(starts)
    counts = jnp.asarray(counts)
    total_chunks = int(np.sum((np.asarray(counts) + args.chunk - 1)
                              // args.chunk))

    las = {"off": [False], "on": [True], "both": [False, True]}[args.lookahead]
    for tps in args.tps:
        for la in las:
            def fwd(g, f):
                out, out_p, trans = composite_pairs(
                    g, f, starts, counts, gw, gh, 16, args.chunk, max_chunks,
                    args.channels, args.interpret, tps, True, la)
                return jnp.sum(out) + jnp.sum(trans)

            def fwdbwd(g, f):
                l, grads = jax.value_and_grad(fwd, argnums=(0, 1))(g, f)
                return l, jnp.sum(grads[0]), jnp.sum(grads[1])

            def timeit(fn):
                jitted = jax.jit(fn)
                jits = [geo.at[0].add(1e-6 * i) for i in range(args.iters + 2)]
                jitted(jits[0], feat)
                jax.block_until_ready(jitted(jits[1], feat))
                t0 = time.perf_counter()
                for i in range(args.iters):
                    r = jitted(jits[2 + i], feat)
                jax.block_until_ready(r)
                return (time.perf_counter() - t0) / args.iters * 1000.0

            t_f = timeit(fwd)
            t_fb = timeit(fwdbwd)
            print(json.dumps({
                "tiles": nt, "content_chunks": total_chunks,
                "pad_slots": p_pad, "tps": tps, "lookahead": la,
                "chunk": args.chunk, "max_chunks": max_chunks,
                "fwd_ms": round(t_f, 3),
                "bwd_ms": round(t_fb - t_f, 3),
                "us_per_chunk_fwd": round(t_f * 1000 / max(total_chunks, 1), 2),
                "us_per_chunk_bwd": round((t_fb - t_f) * 1000
                                          / max(total_chunks, 1), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
