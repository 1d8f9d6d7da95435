#!/usr/bin/env python
"""Per-phase timing + roofline accounting for the bench train step.

Times each phase of the Stage-I step (preprocess+binning / forward composite /
backward / losses+Adam) as separately-jitted programs on the bench scene, and
compares measured time against v5e-1 hardware ceilings (flop + HBM-byte
counts derived from the actual pair statistics) to classify each phase as
MXU-, HBM-, or overhead-bound. Run SOLO on the chip (shared-chip numbers are
unusable). Writes a markdown table to stdout.

Methodology notes:
- every probe varies its inputs per call (the axon platform caches identical
  executions);
- phases are measured as deltas of nested programs (prep; prep+fwd;
  prep+fwd+bwd; full step) because intermediate pair tables are too large to
  round-trip; each program is compiled once and timed over `--iters` calls.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e single-chip ceilings (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM)
PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 49.0  # MXU f32 ~= bf16/4
HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench
    from hairgs_tpu.render.renderer import RasterConfig, render
    from hairgs_tpu.models.gaussian import gaussian_render_inputs
    from hairgs_tpu.render.preprocess import preprocess
    from hairgs_tpu.render.binning import bin_gaussians_sorted, paged_capacity
    from hairgs_tpu.train.trainer import make_gaussian_train_step

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--max_tiles", type=int, default=16)
    p.add_argument("--max_pairs", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--feat_bf16", action="store_true")
    p.add_argument("--tiles_per_step", type=int, default=32)
    p.add_argument("--pair_capacity", type=int, default=0,
                   help="compact paged table slots (0 = worst-case sizing); "
                        "pass the measured pairs_demand to quantify the "
                        "padding tax")
    p.add_argument("--no_stats", action="store_true",
                   help="compile the densification-stats rows out of the "
                        "backward (viewspace_stats=False)")
    p.add_argument("--dma_lookahead", action="store_true")
    p.add_argument("--alpha_min", type=float, default=1.0 / 255.0,
                   help="per-pair alpha gate; raising it culls more pairs "
                        "(perf lever), lowering it admits fainter splats")
    p.add_argument("--bin_phases", action="store_true",
                   help="also time binning sub-phases (preprocess / +expand "
                        "/ +sort / full) — 3 extra compiles")
    p.add_argument("--n_gaussians", type=int, default=100_000)
    p.add_argument("--width", type=int, default=999)
    p.add_argument("--height", type=int, default=1000)
    p.add_argument("--scale_lo", type=float, default=5e-4,
                   help="min gaussian scale (use ~2e-4 with --aniso for a "
                        "Stage-III-like thin-segment population)")
    p.add_argument("--aniso", action="store_true",
                   help="hair-like anisotropy: x-scale 20-60x the minors")
    args = p.parse_args()

    model, opt, cams, width, height = build_bench(
        n_gaussians=args.n_gaussians, width=args.width, height=args.height)
    if args.aniso:
        rng = np.random.default_rng(1)
        n = args.n_gaussians
        minor = rng.uniform(args.scale_lo / 4, args.scale_lo, (n, 1))
        major = minor * rng.uniform(20, 60, (n, 1))
        arrays = model.host_arrays()
        arrays["scaling"] = np.log(
            np.concatenate([major, minor, minor], axis=1)
        ).astype(np.float32)
        model._install(arrays, n, moments=model.host_moments(), step=0)
    cfg = RasterConfig(max_tiles_per_gaussian=args.max_tiles,
                       max_pairs_per_tile=args.max_pairs, chunk=args.chunk,
                       use_pallas=True, feat_bf16=args.feat_bf16,
                       tiles_per_step=args.tiles_per_step,
                       pair_capacity=args.pair_capacity,
                       viewspace_stats=not args.no_stats,
                       dma_lookahead=args.dma_lookahead,
                       alpha_min=args.alpha_min)
    ts = cfg.tile_size
    gw, gh = (width + ts - 1) // ts, (height + ts - 1) // ts

    def prep_and_bin(params, cam, jitter):
        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        m3 = inputs["means3d"] + jitter  # vary inputs per call
        prep = preprocess(m3, inputs["scales"], inputs["rotations"], cam,
                          width, height, ts, active=model.active,
                          opacity=inputs["opacity"])
        opa_eff = jnp.where(prep.valid, inputs["opacity"], 0.0)
        q_cut = jnp.log(jnp.maximum(opa_eff, 1e-12) * 255.0)
        b = bin_gaussians_sorted(
            prep.rect, prep.depth, prep.valid, gw, gh,
            cfg.max_tiles_per_gaussian, cfg.max_pairs_per_tile, cfg.chunk,
            xy=prep.xy, conic=prep.conic, q_cut=q_cut,
            pair_capacity=cfg.pair_capacity)
        return (jnp.sum(b.counts), b.overflow_pairs, b.overflow_tiles,
                b.pairs_demand)

    def prep_only(params, cam, jitter):
        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        m3 = inputs["means3d"] + jitter
        prep = preprocess(m3, inputs["scales"], inputs["rotations"], cam,
                          width, height, ts, active=model.active,
                          opacity=inputs["opacity"])
        return (jnp.sum(prep.rect), jnp.sum(prep.depth),
                jnp.sum(prep.conic))

    def prep_expand(params, cam, jitter):
        from hairgs_tpu.render.binning import _expand_pairs

        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        m3 = inputs["means3d"] + jitter
        prep = preprocess(m3, inputs["scales"], inputs["rotations"], cam,
                          width, height, ts, active=model.active,
                          opacity=inputs["opacity"])
        opa_eff = jnp.where(prep.valid, inputs["opacity"], 0.0)
        q_cut = jnp.log(jnp.maximum(opa_eff, 1e-12) * 255.0)
        tile, opf = _expand_pairs(prep.rect, prep.valid, gw, gh,
                                  cfg.max_tiles_per_gaussian, xy=prep.xy,
                                  conic=prep.conic, q_cut=q_cut,
                                  tile_size=ts)
        return jnp.sum(tile), opf

    def prep_expand_sort(params, cam, jitter):
        from hairgs_tpu.render.binning import _expand_pairs

        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        m3 = inputs["means3d"] + jitter
        prep = preprocess(m3, inputs["scales"], inputs["rotations"], cam,
                          width, height, ts, active=model.active,
                          opacity=inputs["opacity"])
        opa_eff = jnp.where(prep.valid, inputs["opacity"], 0.0)
        q_cut = jnp.log(jnp.maximum(opa_eff, 1e-12) * 255.0)
        tile, _ = _expand_pairs(prep.rect, prep.valid, gw, gh,
                                cfg.max_tiles_per_gaussian, xy=prep.xy,
                                conic=prep.conic, q_cut=q_cut, tile_size=ts)
        # same fused int32 key as bin_gaussians_sorted
        nt = gw * gh
        depth_bits = max(1, min(23, int(np.floor(np.log2(2**31 / (nt + 1))))))
        levels = (1 << depth_bits) - 1
        d = jax.lax.stop_gradient(prep.depth)
        dq = (jnp.clip(d / (d + 1.0), 0.0, 1.0) * levels).astype(jnp.int32)
        key = tile * (levels + 1) + dq[:, None]
        flat_idx = jnp.arange(key.size, dtype=jnp.int32)
        sorted_key, perm = jax.lax.sort((key.reshape(-1), flat_idx),
                                        num_keys=1, is_stable=True)
        return jnp.sum(sorted_key), jnp.sum(perm)

    def fwd(params, cam, jitter):
        inputs = gaussian_render_inputs(params, cam.cam_center, 0)
        inputs["means3d"] = inputs["means3d"] + jitter
        out = render(cam, **inputs, active=model.active,
                     width=width, height=height, config=cfg)
        return jnp.sum(out["render"]), jnp.sum(out["tile_counts"])

    def fwd_bwd(params, cam, jitter):
        def loss_fn(p):
            inputs = gaussian_render_inputs(p, cam.cam_center, 0)
            inputs["means3d"] = inputs["means3d"] + jitter
            out = render(cam, **inputs, active=model.active,
                         width=width, height=height, config=cfg)
            return jnp.sum(out["render"] ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        return l, jax.tree.map(jnp.sum, g)

    step_fn = make_gaussian_train_step(opt, cfg, width=width, height=height,
                                       active_sh_degree=0)

    def timeit(fn, n, argsets):
        """argsets[0:2] warm up; argsets[2:2+n] are timed — every timed call
        gets DISTINCT inputs (the axon platform serves identical executions
        from cache, which would halve the measured time)."""
        assert len(argsets) >= n + 2
        fn(*argsets[0])  # compile
        jax.block_until_ready(fn(*argsets[1]))
        t0 = time.perf_counter()
        for i in range(n):
            r = fn(*argsets[2 + i])
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1000.0

    jits = [jnp.asarray(np.random.default_rng(i).normal(0, 1e-6, (1, 3))
                        .astype(np.float32)) for i in range(args.iters + 2)]
    cam = cams[0]
    jp = jax.jit(prep_and_bin)
    jf = jax.jit(fwd)
    jb = jax.jit(fwd_bwd)

    t_prep = timeit(jp, args.iters, [(model.params, cam, j) for j in jits])
    pairs, opf, otl, demand = jax.device_get(jp(model.params, cam, jits[0]))
    bin_sub = None
    if args.bin_phases:
        argsets = [(model.params, cam, j) for j in jits]
        t_p0 = timeit(jax.jit(prep_only), args.iters, argsets)
        t_pe = timeit(jax.jit(prep_expand), args.iters, argsets)
        t_ps = timeit(jax.jit(prep_expand_sort), args.iters, argsets)
        bin_sub = {"preprocess": round(t_p0, 2),
                   "expand_cull": round(t_pe - t_p0, 2),
                   "sort": round(t_ps - t_pe, 2),
                   "index_build+gathers": round(t_prep - t_ps, 2)}
    t_fwd = timeit(jf, args.iters, [(model.params, cam, j) for j in jits])
    t_bwd = timeit(jb, args.iters, [(model.params, cam, j) for j in jits])

    # full step: varies via Adam updates; copy state since it donates
    def run_step(i):
        nonlocal params, stats, opt_state
        params, stats, opt_state, metrics, _ = step_fn(
            params, stats, opt_state, model.active, cams[i % 4],
            jnp.asarray(i + 1))
        return params
    params, stats, opt_state = model.params, model.stats, model.opt_state
    run_step(0)
    jax.block_until_ready(run_step(1))
    t0 = time.perf_counter()
    for i in range(args.iters):
        r = run_step(i + 2)
    jax.block_until_ready(r)
    t_step = (time.perf_counter() - t0) / args.iters * 1000.0

    # ---- roofline accounting from actual pair stats
    n = model.capacity
    total_pairs = int(pairs)
    if cfg.pair_capacity > 0:
        from hairgs_tpu.render.binning import compact_capacity

        p_pad = compact_capacity(cfg.pair_capacity, n,
                                 cfg.max_tiles_per_gaussian, gw * gh,
                                 cfg.chunk)
    else:
        p_pad = paged_capacity(n, cfg.max_tiles_per_gaussian, gw * gh,
                               cfg.chunk)
    geo_b = 8 * 4
    feat_b = 8 * (2 if cfg.feat_bf16 else 4)
    # forward: gather pair rows (read packed + write paged + read in kernel)
    fwd_bytes = p_pad * (geo_b + feat_b) * 3 + gw * gh * ts * ts * 8 * 4
    # per pair-pixel compositor flops (exp + per-channel fma, 7ch + alpha)
    fwd_flops = total_pairs * ts * ts * 40
    # backward reads the tables twice (fwd recompute + grads) + writes grads
    bwd_bytes = p_pad * (geo_b + feat_b) * 5
    bwd_flops = total_pairs * ts * ts * 90

    def bound(ms, fl, by):
        t_mxu = fl / (PEAK_F32_TFLOPS * 1e12) * 1e3
        t_hbm = by / (HBM_GBPS * 1e9) * 1e3
        lim = max(t_mxu, t_hbm)
        return {
            "flop_ms": round(t_mxu, 3), "hbm_ms": round(t_hbm, 3),
            "utilization_vs_best_bound": round(lim / ms, 3) if ms else None,
        }

    out = {
        "config": {"max_tiles": cfg.max_tiles_per_gaussian,
                   "max_pairs": cfg.max_pairs_per_tile,
                   "chunk": cfg.chunk, "feat_bf16": cfg.feat_bf16,
                   "pair_capacity": cfg.pair_capacity,
                   "viewspace_stats": cfg.viewspace_stats},
        "pairs": total_pairs, "pad_slots": p_pad,
        "pairs_demand": int(demand),
        "overflow": [int(opf), int(otl)],
        "bin_phases_ms": bin_sub,
        "ms": {"prep+bin": round(t_prep, 2),
               "fwd_total": round(t_fwd, 2),
               "fwd_composite": round(t_fwd - t_prep, 2),
               "fwd+bwd": round(t_bwd, 2),
               "bwd": round(t_bwd - t_fwd, 2),
               "full_step": round(t_step, 2),
               "losses+adam+stats": round(t_step - t_bwd, 2)},
        "roofline": {
            "fwd_composite": bound(t_fwd - t_prep, fwd_flops, fwd_bytes),
            "bwd": bound(t_bwd - t_fwd, bwd_flops, bwd_bytes),
        },
        "iters_per_sec": round(1000.0 / t_step, 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
