#!/usr/bin/env python
"""Benchmark: Stage-I training iterations/sec per chip.

Workload mirrors the reference's headline configuration (BASELINE.md): a
Stage-I GaussianModel optimization step at 1000x1000 with ~100k Gaussians —
fused rgb+mask+orientation render, full loss, backward, densification-stat
accumulation, and Adam — i.e. everything the reference does per train.py
iteration except the host-side topology ops that run every 100 iterations.

vs_baseline: the repo publishes no numbers (BASELINE.json "published": {}),
and this environment has neither a CUDA GPU nor network egress, so the CUDA
rate must be bracketed rather than measured. Bracketing from public 3DGS
data: vanilla 3DGS trains 30k iters at ~1080p/1-300k gaussians in 20-35 min
on RTX-3090/4090-class hardware = 14-25 it/s average, single rasterization
per step. The reference issues THREE full rasterizations fwd+bwd per step
(rgb + mask override + orientation override, loss/losses.py:224-316) with
DISTWAR recovering ~1.5-3x of the backward only — an expected reference rate
of ~6-12 it/s at this scale. The divisor 20.0 it/s is kept as the
deliberately conservative (framework-unfavorable) upper bracket so the ratio
stays comparable across rounds; vs_baseline therefore UNDERSTATES the true
speedup by roughly 2x. Re-derive when a measured CUDA number is available.

Prints exactly one JSON line.
"""

import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

ASSUMED_CUDA_REFERENCE_ITERS_PER_SEC = 20.0


def _probe_backend_ok(timeout=120):
    """Probe `jax.devices()` in a clean subprocess (JAX caches backend-init
    failure for the process lifetime, so probing in-process would poison the
    real run)."""
    code = "import jax; print(jax.devices()[0].platform)"
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, timeout=timeout)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(max_wait=600):
    """Bounded retry/backoff on TPU backend init (round-3 lost its official
    bench artifact to one transient 'Unable to initialize backend' window)."""
    delay, waited = 10, 0
    while waited <= max_wait:
        if _probe_backend_ok():
            return True
        print(f"bench: backend probe failed, retrying in {delay}s "
              f"({waited}s waited)", file=sys.stderr)
        time.sleep(delay)
        waited += delay
        delay = min(delay * 2, 120)
    return False


def _fallback_from_runs():
    """Last-resort: emit the most recent builder-measured bench artifact so
    the round still records a number (marked STALE in the unit string)."""
    candidates = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "_runs", "perf_r*", "bench_*.json")),
        key=os.path.getmtime)
    for path in reversed(candidates):
        try:
            with open(path) as f:
                rec = json.loads(f.read().strip().splitlines()[-1])
            if "value" in rec:
                rec["unit"] = rec.get("unit", "") + \
                    f" [STALE fallback: backend unavailable, from {os.path.relpath(path)}]"
                print(json.dumps(rec))
                return True
        except Exception:
            continue
    return False


def _chip_contended():
    """Pid of a live training run currently owning the TPU chip (train.py
    writes /tmp/hairgs_tpu_chip_busy.lock while it trains on TPU), else
    None. Shared-chip timings are documented-garbage (~half the solo rate,
    with all kernel variants reading identical), so the caller prefers a
    recent solo artifact over a live measurement when this fires."""
    try:
        with open("/tmp/hairgs_tpu_chip_busy.lock") as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    if pid == os.getpid():
        return None
    try:
        os.kill(pid, 0)  # liveness probe only
    except OSError:
        return None
    return pid


def _fallback_solo_artifact(note):
    """Emit the freshest builder-measured bench artifact (< 24 h old) with
    explicit provenance appended to the unit string. Returns False when no
    fresh artifact exists (caller measures live instead)."""
    candidates = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "_runs", "perf_r*", "bench_*.json")),
        key=os.path.getmtime)
    # default-config artifacts outrank knob-A/B ones regardless of which was
    # written last (the A/B sweeps run AFTER the headline in the campaign)
    headline = [p for p in candidates
                if os.path.basename(p) == "bench_headline.json"]
    others = [p for p in candidates if p not in headline]
    candidates = others + headline  # reversed() scans headline first
    for path in reversed(candidates):
        if time.time() - os.path.getmtime(path) > 24 * 3600:
            continue
        try:
            with open(path) as f:
                rec = json.loads(f.read().strip().splitlines()[-1])
            if "value" in rec:
                rec["unit"] = rec.get("unit", "") + \
                    f" [{note}, from {os.path.relpath(path)}]"
                print(json.dumps(rec))
                return True
        except Exception:
            continue
    return False


def build_bench(n_gaussians=100_000, width=999, height=1000, seed=0):
    import jax.numpy as jnp

    from hairgs_tpu.config import OptimizationConfig
    from hairgs_tpu.core.camera import make_camera
    from hairgs_tpu.models.gaussian import GaussianModel

    rng = np.random.default_rng(seed)
    # head-scale cloud (~0.35m across at 0.55m — fills most of the frame,
    # per-tile depth complexity comparable to a mid-training USC scene)
    pts = rng.normal(0, 0.11, (n_gaussians, 3)).astype(np.float32)
    pts[:, 2] = 0.55 + rng.normal(0, 0.05, n_gaussians)
    colors = rng.uniform(0.05, 0.95, (n_gaussians, 3)).astype(np.float32)

    model = GaussianModel(sh_degree=0, capacity_round=4096)
    model.create_from_pcd(pts, colors)
    opt = OptimizationConfig()
    model.training_setup(opt)
    # typical mid-training scales: a few pixels on screen
    arrays = model.host_arrays()
    arrays["scaling"] = np.log(
        rng.uniform(5e-4, 3e-3, (n_gaussians, 3))
    ).astype(np.float32)
    model._install(arrays, n_gaussians, moments=model.host_moments(), step=0)

    # a ring of viewpoints: the timed loop rotates through them so the
    # headline number includes tile-occupancy variance across views (a fixed
    # camera would also let the axon identical-execution cache understate
    # per-step cost if the inputs ever repeated)
    cams = []
    c = np.array([0.0, 0.0, 0.55])  # cloud center
    for i in range(4):
        angle = 2 * np.pi * i / 4
        R = np.array([
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ])
        # ring camera: cloud center maps to (0,0,0.55) in every view
        # (world_to_view: x_view = R^T x + t, R is cam-to-world)
        cam = make_camera(R, c - R.T @ c, fovx=1.2, fovy=1.0)
        img = rng.uniform(0, 1, (height, width, 3)).astype(np.float32)
        mask = (rng.uniform(0, 1, (height, width)) > 0.5).astype(np.float32)
        orient = rng.uniform(0, np.pi, (height, width)).astype(np.float32)
        conf = rng.uniform(0, 1, (height, width)).astype(np.float32)
        cams.append(cam._replace(
            image=jnp.asarray(img), mask=jnp.asarray(mask),
            orientation=jnp.asarray(orient), confidence=jnp.asarray(conf),
        ))
    return model, opt, cams, width, height


def main():
    import argparse
    from argparse import BooleanOptionalAction

    if not _wait_for_backend():
        if _fallback_from_runs():
            return
        print(json.dumps({
            "metric": "stage1_train_iters_per_sec", "value": 0.0,
            "unit": "iter/s [backend unavailable after 600s of retries; "
                    "no stale artifact found]",
            "vs_baseline": 0.0,
        }))
        return

    busy_pid = _chip_contended()
    if busy_pid is not None and _fallback_solo_artifact(
            f"SOLO artifact: chip currently shared with training pid "
            f"{busy_pid}; live timing would read ~half the real rate"):
        return

    import jax
    import jax.numpy as jnp

    from hairgs_tpu.render.renderer import RasterConfig
    from hairgs_tpu.train.trainer import make_gaussian_train_step

    parser = argparse.ArgumentParser()
    parser.add_argument("--feat_bf16", action="store_true")
    parser.add_argument("--max_tiles", type=int, default=16)
    parser.add_argument("--chunk", type=int, default=128)
    parser.add_argument("--max_pairs", type=int, default=2048)
    parser.add_argument("--tiles_per_step", type=int, default=32)
    parser.add_argument("--pair_capacity", type=int, default=786432,
                        help="compact paged pair-table slots (0 = worst-case "
                             "n*max_tiles sizing). Default covers the bench "
                             "scene's measured ~590k-slot demand with "
                             "headroom (round-4 solo A/B: +12.8%% vs "
                             "worst-case, bit-identical)")
    parser.add_argument("--no_stats", action="store_true",
                        help="compile densification-stats rows out of the "
                             "backward (post-densify regime)")
    parser.add_argument("--dma_lookahead", action=BooleanOptionalAction,
                        default=True,
                        help="cross-tile DMA prefetch in the compositor "
                             "kernels (bit-identical scheduling change, "
                             "proven on hardware; default-on since r5)")
    parser.add_argument("--alpha_min", type=float, default=1.0 / 255.0,
                        help="per-pair alpha gate (reference 1/255); raising "
                             "it culls more pairs — a perf lever to A/B")
    parser.add_argument("--n_cams", type=int, default=4,
                        help="viewpoints rotated through the timed loop "
                             "(1 reproduces the round-2 fixed-camera "
                             "methodology for like-for-like comparisons)")
    args = parser.parse_args()

    model, opt, cams, width, height = build_bench()
    cams = cams[: max(1, args.n_cams)]
    cfg = RasterConfig(max_tiles_per_gaussian=args.max_tiles,
                       max_pairs_per_tile=args.max_pairs,
                       chunk=args.chunk, use_pallas=True,
                       feat_bf16=args.feat_bf16,
                       tiles_per_step=args.tiles_per_step,
                       pair_capacity=args.pair_capacity,
                       viewspace_stats=not args.no_stats,
                       dma_lookahead=args.dma_lookahead,
                       alpha_min=args.alpha_min)
    step_fn = make_gaussian_train_step(opt, cfg, width=width, height=height,
                                       active_sh_degree=0)

    params, stats, opt_state = model.params, model.stats, model.opt_state
    # warmup / compile
    for i in range(3):
        params, stats, opt_state, metrics, _ = step_fn(
            params, stats, opt_state, model.active, cams[i % len(cams)],
            jnp.asarray(i + 1)
        )
    jax.block_until_ready(params)

    # timed loop rotates through 4 ring viewpoints (occupancy variance
    # included; Adam updates additionally vary every input each step)
    n_timed = 20
    t0 = time.perf_counter()
    for i in range(n_timed):
        params, stats, opt_state, metrics, _ = step_fn(
            params, stats, opt_state, model.active, cams[i % len(cams)],
            jnp.asarray(i + 4)
        )
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    iters_per_sec = n_timed / dt

    shared_note = (
        f" [SHARED CHIP: concurrent training pid {busy_pid}; "
        "underestimates the solo rate ~2x]" if busy_pid is not None else "")
    print(json.dumps({
        "metric": "stage1_train_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iter/s (100k gaussians, 1000x1000, fused rgb+mask+orientation, "
                f"{len(cams)} viewpoint{'s' if len(cams) > 1 else ''})"
                + shared_note,
        "vs_baseline": round(iters_per_sec / ASSUMED_CUDA_REFERENCE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
