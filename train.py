#!/usr/bin/env python
"""Stage-I / Stage-III training driver.

Parity target: reference train.py — same CLI surface (flag names from
arguments/__init__.py), same schedule: random camera per step, SH degree bump
every 1000 iters, densify in (densify_from_iter, densify_until_iter] every
densification_interval, opacity reset every opacity_reset_interval, hair
merging every merge_interval / growing every growth_interval, checkpoint every
save_frequency, eval at eval_frequency and at the end.

TPU redesign: the hot loop is one jitted XLA program (fused multi-channel
render + loss + backward + Adam); topology ops run host-side at their
(infrequent) cadence and write back into capacity-padded arenas.
"""

import os
import sys
import time
import uuid
from argparse import ArgumentParser

import numpy as np

from hairgs_tpu.config import (
    GeneralConfig,
    ModelConfig,
    OptimizationConfig,
    RuntimeConfig,
    add_config_args,
    extract_config,
    load_cfg_args,
    save_cfg_args,
)


class TileBudgetController:
    """Adaptive per-gaussian tile budget.

    The CUDA reference duplicates one sort key per touched tile into an
    unbounded arena (rasterizer_impl.cu:277-308); our fixed-shape pair table
    caps tiles-per-gaussian instead. This controller grows the cap (×2 up to
    `cap`) when a sync observes >`grow_frac` of the pair budget truncated, and
    shrinks it back toward the configured base after `shrink_after`
    consecutive overflow-free syncs — sort/paging volume scales linearly with
    the cap, and the big blurry splats of early training disappear after
    densification. Each change recompiles the step, so hysteresis matters.
    """

    def __init__(self, base, cap=64, grow_frac=0.01, shrink_after=20):
        self.base = base
        self.cap = cap
        self.grow_frac = grow_frac
        self.shrink_after = shrink_after
        self.clean_syncs = 0

    def update(self, overflow_pairs, n_prims, budget):
        """Returns the new budget, or None when no change is needed."""
        if overflow_pairs > self.grow_frac * n_prims * budget and budget < self.cap:
            self.clean_syncs = 0
            return min(budget * 2, self.cap)
        if overflow_pairs == 0:
            self.clean_syncs += 1
            if self.clean_syncs >= self.shrink_after and budget > self.base:
                self.clean_syncs = 0
                return budget // 2
        else:
            self.clean_syncs = 0
        return None


class PairCapacityController:
    """Adaptive compact pair-table sizing (RasterConfig.pair_capacity).

    The paged pair table's worst-case size (n * max_tiles_per_gaussian) is
    6-9x the post-cull real pair count at hair scale, and every downstream
    buffer pays that padding in HBM traffic. The renderer reports the
    chunk-padded demand each sync, so this controller can jump straight to
    the right bucket: grow immediately on any capacity truncation
    (correctness: truncated pairs get no gradient), shrink only after
    `shrink_after` consecutive syncs of <50% occupancy (every change
    recompiles the step — minutes on the remote compile helper).
    """

    def __init__(self, granule, headroom=1.25, shrink_after=50):
        self.granule = granule
        self.headroom = headroom
        self.shrink_after = shrink_after
        self.low_syncs = 0

    def bucket(self, demand):
        want = int(demand * self.headroom)
        return ((want + self.granule - 1) // self.granule) * self.granule

    def update(self, overflow_capacity, pairs_demand, capacity):
        """Returns the new capacity, or None when no change is needed."""
        if overflow_capacity > 0:
            self.low_syncs = 0
            return max(self.bucket(pairs_demand), capacity + self.granule)
        if pairs_demand < 0.5 * capacity:
            self.low_syncs += 1
            if self.low_syncs >= self.shrink_after:
                self.low_syncs = 0
                new = self.bucket(pairs_demand)
                if new < capacity - self.granule:
                    return new
        else:
            self.low_syncs = 0
        return None


class TilePairCapController:
    """Adaptive per-tile pair cap (RasterConfig.max_pairs_per_tile).

    Round-3's post-mortem identified tile-cap overflow (deepest pairs of a
    saturated tile silently dropped, so the GT behind them gets no gradient)
    as the Stage-III quality killer, and round 4's Stage-I campaign leg ran
    at a sustained ~10k dropped pairs/step (VERDICT r4 item 6). This grows
    the cap ×2 (alignment-preserving: the pallas layout needs a multiple of
    8*chunk, and the base already is one) whenever a sync drops more than
    `grow_frac` of the step's real pair demand, and shrinks back toward the
    base after `shrink_after` consecutive clean syncs. The 0.1% grow_frac is
    the overflow-zero premise of the corrective recipe (BASELINE.md).
    """

    def __init__(self, base, cap=8192, grow_frac=0.001, shrink_after=50):
        self.base = base
        self.cap = cap
        self.grow_frac = grow_frac
        self.shrink_after = shrink_after
        self.clean_syncs = 0

    def update(self, overflow_tiles, pairs_demand, max_pairs):
        """Returns the new per-tile cap, or None when no change is needed."""
        if (overflow_tiles > self.grow_frac * max(pairs_demand, 1)
                and max_pairs < self.cap):
            self.clean_syncs = 0
            return min(max_pairs * 2, self.cap)
        if overflow_tiles == 0:
            self.clean_syncs += 1
            if self.clean_syncs >= self.shrink_after and max_pairs > self.base:
                self.clean_syncs = 0
                return max_pairs // 2
        else:
            self.clean_syncs = 0
        return None


def prepare_output_path(args):
    """utils/system.py:41-54 — default ./output/<uuid>, persist cfg_args."""
    if not args.model_path:
        args.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    print(f"Output folder: {args.model_path}")
    os.makedirs(args.model_path, exist_ok=True)
    save_cfg_args(args.model_path, args)


def training(mp, op, gp, rt, args):
    import jax
    import jax.numpy as jnp

    from hairgs_tpu.evaluation.eval_data import (
        compute_eval_data_from_gaussian,
        compute_eval_data_from_hair,
    )
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.logging_utils import TrainingInfo, get_logger
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.core.schedules import expon_lr
    from hairgs_tpu.render.renderer import RasterConfig
    from hairgs_tpu.scene import Scene
    from hairgs_tpu.topo.graph_ops import (
        hair_densification,
        hair_growing,
        hair_merging,
        hair_reset_opacity,
    )
    from hairgs_tpu.topo.strands import smooth_pair_indices
    from hairgs_tpu.train.trainer import make_gaussian_train_step, make_hair_train_step

    scene = Scene(args, shuffle=True, capacity_round=rt.capacity_round)
    model = scene.gaussians
    model.training_setup(op)
    is_hair = isinstance(model, HairModel)
    logger = get_logger(args)
    info = TrainingInfo(iter=scene.loaded_iter)

    cameras = scene.get_cameras()
    height, width = cameras[0].height, cameras[0].width
    use_pallas = rt.use_pallas
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"

    if jax.default_backend() == "tpu":
        # Advertise chip ownership for the round's benchmark artifact:
        # shared-chip timings read ~half the solo rate (every kernel variant
        # measured identical while a training run time-sliced the chip in
        # round 3), so bench.py checks this pid-lock and reports a recent
        # solo artifact with provenance instead of a corrupted live number.
        import atexit

        lock = "/tmp/hairgs_tpu_chip_busy.lock"
        try:
            with open(lock, "w") as f:
                f.write(str(os.getpid()))
            atexit.register(
                lambda: os.path.exists(lock) and os.remove(lock))
        except OSError:
            pass

    num_tiles = (((width + 15) // 16) * ((height + 15) // 16))
    cap_ctl = PairCapacityController(rt.pair_capacity_round)
    # densification stats (the dual-cotangent aux rows) cost two extra
    # matmuls per chunk in the pallas backward — the step's largest phase.
    # They are only consumed by densification events, so they are compiled
    # out whenever the densify window is closed (incl. polish legs that run
    # with --densify_until_iter 0).
    stats_enabled = op.densify_until_iter > 1

    def initial_pair_capacity():
        if rt.pair_capacity < 0:
            return 0  # worst-case n*max_tiles sizing, never truncates
        if rt.pair_capacity > 0:
            return rt.pair_capacity
        # adaptive start: ~3 surviving tiles/prim + the per-tile chunk pad
        # floor; the controller re-buckets from measured demand after the
        # first sync
        est = 3 * model.capacity + (num_tiles + 1) * rt.composite_chunk
        return cap_ctl.bucket(est / cap_ctl.headroom)

    def make_raster_cfg(max_tiles, pair_cap=None, max_pairs=None):
        pallas_on = bool(use_pallas) and use_pallas != "false"
        max_pairs = rt.max_pairs_per_tile if max_pairs is None else max_pairs
        if pallas_on and jax.default_backend() == "tpu":
            # fail at startup, not after the 5-10 min scene load + compile:
            # the pallas table layouts need max_chunks in sublane multiples
            assert (max_pairs % rt.composite_chunk == 0
                    and (max_pairs // rt.composite_chunk) % 8 == 0), (
                f"pallas path needs max_pairs_per_tile to be a multiple of "
                f"8*composite_chunk (got {max_pairs}/"
                f"{rt.composite_chunk})")
        return RasterConfig(
            max_tiles_per_gaussian=max_tiles,
            max_pairs_per_tile=max_pairs,
            chunk=rt.composite_chunk,
            use_pallas=pallas_on,
            feat_bf16=rt.feat_bf16,
            antialiasing=rt.antialiasing,
            alpha_min=rt.alpha_min,
            viewspace_stats=stats_enabled,
            dma_lookahead=rt.dma_lookahead and pallas_on,
            # compact tables only exist on the paged pallas layout; the XLA
            # path ignores them, and a positive value there would only feed
            # the capacity controller zeros and trigger a pointless recompile
            pair_capacity=((initial_pair_capacity() if pallas_on else 0)
                           if pair_cap is None else pair_cap),
        )

    raster_cfg = make_raster_cfg(rt.max_tiles_per_gaussian)

    # interactive 3D strand view (reference train.py:61-62; pyvista-gated)
    vis3d_plotter = vis3d_polydata = None
    if gp.vis3d and is_hair:
        try:
            from hairgs_tpu.visualization import create_pv_background_plotter

            vis3d_plotter, vis3d_polydata = create_pv_background_plotter(
                model, cameras, background=True)
        except ImportError as e:
            print(f"[vis3d] disabled ({e})")

    # device-side in-training metrics (ROADMAP 12): chunked masked ball-query
    # matmuls on the accelerator instead of pulling the model to host for the
    # scipy oracle; the final eval keeps the host path (incl. strand
    # consistency, which needs sparse per-strand vote counting).
    use_device_eval = rt.device_eval == "true" or (
        rt.device_eval == "auto" and jax.default_backend() == "tpu"
    )
    gt_device = None

    def run_eval_device():
        nonlocal gt_device
        from hairgs_tpu.evaluation.device_metrics import compute_metrics_device
        from hairgs_tpu.evaluation.eval_data import (
            eval_points_device_from_gaussian,
            eval_points_device_from_hair,
        )

        if gt_device is None:
            gt_device = (
                jnp.asarray(scene.gt.points, jnp.float32),
                jnp.asarray(scene.gt.directions, jnp.float32),
            )
        pts, dirs, valid = (
            eval_points_device_from_hair(model)
            if is_hair
            else eval_points_device_from_gaussian(model)
        )
        return compute_metrics_device(
            pts, dirs, gt_device[0], gt_device[1], pred_valid=valid,
            bidirectional=op.bidirectional_eval,
        )

    def run_eval(final: bool = False):
        if scene.gt is None:
            return None, None
        if use_device_eval and not final:
            return run_eval_device()
        pred = (
            compute_eval_data_from_hair(model)
            if is_hair
            else compute_eval_data_from_gaussian(model)
        )
        info.pred = pred
        return compute_metrics(pred=pred, gt=scene.gt, bidirectional=op.bidirectional_eval)

    def run_image_eval():
        from hairgs_tpu.evaluation.image_metrics import evaluate_image_metrics

        info.image_metrics = evaluate_image_metrics(model, cameras, config=raster_cfg)
        if info.image_metrics and not gp.quiet:
            parts = "  ".join(f"{k} {v:.3f}" for k, v in info.image_metrics.items())
            print(f"[eval] iter {info.iter}: {parts}")

    info.eval_metrics, info.eval_thresholds = run_eval()
    logger.log(info, model)

    # --- view-batch data parallelism (SURVEY §2.3: per-step view minibatch
    # sharded over the mesh "data" axis; gradients psum over ICI). Schedule
    # semantics: a K-view step advances the iteration counter by K, so all
    # cadences (densify/merge/save) and the total number of views seen match
    # K reference iterations; gradients are the view MEAN (Adam's per-param
    # normalization makes mean-vs-single-view magnitude-neutral, and the
    # densification stats are accumulated per view, not from the mean).
    view_batch = max(1, rt.view_batch)
    gauss_shard = max(1, rt.gauss_shard)
    from hairgs_tpu.parallel.mesh import (
        make_sharded_gaussian_step,
        make_sharded_hair_step,
        make_view_mesh,
    )

    if gauss_shard > 1:
        # depth-slab Gaussian-axis sharding (SURVEY §2.3 spatial sharding),
        # composable with view-DP via a (data x gauss) 2D mesh
        from hairgs_tpu.parallel.slab import make_2d_mesh

        n_dev = len(jax.devices())
        assert n_dev >= gauss_shard, (
            f"--gauss_shard {gauss_shard} needs that many devices, "
            f"have {n_dev}")
        data_size = max(1, min(n_dev // gauss_shard, view_batch))
        while view_batch % data_size:
            data_size -= 1
        mesh = make_2d_mesh(data_size, gauss_shard)
        capacity = (model.graph.endpoint_pairs.shape[0] if is_hair
                    else model.capacity)
        assert capacity % gauss_shard == 0, (
            f"arena capacity {capacity} must be a multiple of "
            f"--gauss_shard {gauss_shard} (use a capacity_round that is)")
        print(f"[parallel] gauss_shard={gauss_shard} x data={data_size} "
              f"({mesh.devices.size} device(s))")
    else:
        mesh = make_view_mesh(view_batch, rt.mesh_max_devices)
        if view_batch > 1:
            print(f"[parallel] view_batch={view_batch} over "
                  f"{mesh.devices.size if mesh is not None else 1} device(s)")

    def build_step():
        common = dict(
            width=width, height=height,
            active_sh_degree=model.active_sh_degree,
            spatial_lr_scale=model.spatial_lr_scale,
        )
        if gauss_shard > 1:
            from hairgs_tpu.parallel.slab import make_slab_train_step

            return make_slab_train_step(
                "hair" if is_hair else "gaussian", op, raster_cfg,
                dist_to_scale_factor=(model.dist_to_scale_factor
                                      if is_hair else None),
                mesh=mesh, **common,
            )
        if is_hair:
            fn = make_hair_train_step(
                op, raster_cfg, dist_to_scale_factor=model.dist_to_scale_factor,
                use_magnet=op.lambda_magnet > 0,
                **common,
            )
            return make_sharded_hair_step(fn, mesh) if mesh is not None else fn
        fn = make_gaussian_train_step(op, raster_cfg, **common)
        return make_sharded_gaussian_step(fn, mesh) if mesh is not None else fn

    step_fn = build_step()

    from hairgs_tpu.topo.strands import magnet_indices

    # keep the index tables device-resident: re-uploading them every step is
    # a per-iteration host->device transfer through the remote TPU tunnel
    def _device_smooth(pairs, valid):
        return jnp.asarray(pairs), jnp.asarray(valid)

    # pad the smoothness table to the segment-arena capacity: it is a jit
    # input, so a growing 1024-bucket would recompile the train step at
    # every topology event during densification (minutes each on the
    # remote compile helper)
    def _smooth_cap():
        return model.graph.endpoint_pairs.shape[0]

    smooth_pairs, smooth_valid = (
        _device_smooth(*smooth_pair_indices(model.strands_info,
                                            max_pairs=_smooth_cap()))
        if is_hair else (None, None)
    )
    magnet_idx = (
        tuple(jnp.asarray(x) for x in magnet_indices(model))
        if is_hair and op.lambda_magnet > 0 else None
    )

    def refresh_smooth():
        nonlocal smooth_pairs, smooth_valid, magnet_idx
        smooth_pairs, smooth_valid = _device_smooth(
            *smooth_pair_indices(model.strands_info,
                                 max_pairs=_smooth_cap()))
        if op.lambda_magnet > 0:
            magnet_idx = tuple(jnp.asarray(x) for x in magnet_indices(model))

    topo_worker = None
    if is_hair and rt.async_topology:
        from hairgs_tpu.topo.async_events import TopologyWorker

        topo_worker = TopologyWorker(model)
    elif rt.async_topology and not gp.quiet:
        print("[topo] --async_topology applies to hair models only; ignored")

    import random as pyrandom

    # live viewer (SIBR protocol; train.py:95-131)
    gui = None
    if gp.ip:
        from hairgs_tpu.network_gui import network_gui as gui

        try:
            gui.init(gp.ip, gp.port)
        except OSError as e:
            print(f"[gui] disabled ({e})")
            gui = None

    def serve_gui(iteration):
        if gui is None:
            return
        if gui.conn is None:
            gui.try_connect()
        while gui.conn is not None:
            try:
                cam, do_training, _, _, keep_alive, scaling_mod = gui.receive()
                img_bytes = None
                if cam is not None:
                    from hairgs_tpu.models.gaussian import gaussian_render_inputs
                    from hairgs_tpu.models.hair import hair_render_inputs
                    from hairgs_tpu.render.renderer import render as _render

                    c = cam.to_camera()
                    if is_hair:
                        inputs = hair_render_inputs(
                            model.params, model.graph, c.cam_center,
                            model.active_sh_degree, model.dist_to_scale_factor)
                        active = model.graph.seg_active
                    else:
                        inputs = gaussian_render_inputs(
                            model.params, c.cam_center, model.active_sh_degree)
                        active = model.active
                    out = _render(c, **inputs, active=active,
                                  scale_modifier=scaling_mod or 1.0,
                                  width=cam.width, height=cam.height,
                                  config=raster_cfg)
                    rgb = np.clip(np.asarray(out["render"][..., :3]), 0, 1)
                    img_bytes = memoryview((rgb * 255).astype(np.uint8))
                gui.send(img_bytes, args.source_path)
                if do_training and (iteration < op.iterations or not keep_alive):
                    break
            except Exception:
                gui.conn = None

    # tracing / debugging (reference has only CUDA-event timings + the
    # rasterizer's debug snapshot dumps; SURVEY §5.1-5.2): a jax.profiler
    # trace window and a NaN-hunt mode that dumps full state
    if rt.debug:
        jax.config.update("jax_debug_nans", True)
    profile_dir = os.path.join(args.model_path, "profile")
    profiling = False

    def check_finite(loss, iteration):
        if rt.debug and not np.isfinite(loss):
            dump = os.path.join(args.model_path, f"snapshot_iter{iteration}")
            if hasattr(model, "save_checkpoint"):
                dump += ".npz"
                model.save_checkpoint(dump)
            else:
                dump += ".ply"
                model.save_ply(dump)
            raise FloatingPointError(
                f"non-finite loss {loss} at iteration {iteration}; state dumped"
                f" to {dump}"
            )

    viewpoint_stack = []
    ema_loss = 0.0
    from hairgs_tpu.logging_utils import Logger as _NullLogger

    logging_active = type(logger) is not _NullLogger
    report_interval = 50
    rt.log_interval = max(1, rt.log_interval)
    budget_ctl = TileBudgetController(rt.max_tiles_per_gaussian)
    tilecap_ctl = TilePairCapController(rt.max_pairs_per_tile)
    start_time = time.time()
    iteration = 0
    prev_iter = 0
    step_count = 0
    growth_events_done = 0

    def grow_allowed():
        # the measured Stage-II.5 recipe caps growth at N events (the F1
        # gain saturates at 2 and precision erodes past it — BASELINE.md);
        # 0 keeps the reference's uncapped cadence semantics
        return (op.growth_max_events <= 0
                or growth_events_done < op.growth_max_events)

    def crossed(interval):
        """Did this step cross an interval boundary? For view_batch=1 this is
        exactly `iteration % interval == 0`; for K>1 each boundary fires once."""
        return iteration // interval > prev_iter // interval

    while iteration < op.iterations:
        prev_iter = iteration
        iteration += view_batch
        step_count += 1
        if rt.profile_steps > 0:
            if step_count == 2:  # skip the compile step
                jax.profiler.start_trace(profile_dir)
                profiling = True
            elif profiling and step_count == 2 + rt.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                print(f"[profile] trace written to {profile_dir}")
        serve_gui(iteration)
        info.iter = scene.loaded_iter + iteration
        info.densification_info = {}

        # thresholds scheduled like LRs (hair_gaussian_model.py:285-293)
        if is_hair:
            model.merge_dist_th = float(expon_lr(
                iteration, op.merge_dist_th_init, op.merge_dist_th_final,
                lr_delay_mult=op.position_lr_delay_mult,
                max_steps=op.position_lr_max_steps,
            ))
            model.merge_angle_th = float(expon_lr(
                iteration, op.merge_angle_th_init, op.merge_angle_th_final,
                lr_delay_mult=op.position_lr_delay_mult,
                max_steps=op.position_lr_max_steps,
            ))

        if crossed(1000) and model.active_sh_degree < model.max_sh_degree:
            model.oneup_sh_degree()
            step_fn = build_step()

        # drop the densification-stats rows from the pallas backward once
        # the densify window closes (one recompile; stats are dead weight
        # afterwards — no cadence event reads them past densify_until_iter)
        if (stats_enabled and raster_cfg.use_pallas
                and iteration >= op.densify_until_iter):
            stats_enabled = False
            raster_cfg = make_raster_cfg(raster_cfg.max_tiles_per_gaussian,
                                         raster_cfg.pair_capacity,
                                         raster_cfg.max_pairs_per_tile)
            step_fn = build_step()
            if not gp.quiet:
                print(f"[raster] iter {iteration}: densify window closed — "
                      "dropping viewspace-stats rows from the backward")

        cams_step = []
        for _ in range(view_batch):
            if not viewpoint_stack:
                viewpoint_stack = list(cameras)
            cams_step.append(
                viewpoint_stack.pop(pyrandom.randint(0, len(viewpoint_stack) - 1))
            )
        cam = cams_step[0]
        if view_batch > 1 or gauss_shard > 1:
            # the slab step is a shard_map over the 2D mesh and always takes
            # a batched camera (leading axis split over the data axis)
            from hairgs_tpu.core.camera import stack_cameras

            cam_input = stack_cameras(cams_step)
        else:
            cam_input = cam

        t0 = time.time()
        if is_hair:
            params, stats, opt_state, metrics, image = step_fn(
                model.params, model.graph, model.stats, model.opt_state,
                cam_input,
                jnp.asarray(iteration), smooth_pairs, smooth_valid,
                magnet_idx=magnet_idx,
            )
        else:
            params, stats, opt_state, metrics, image = step_fn(
                model.params, model.stats, model.opt_state, model.active,
                cam_input,
                jnp.asarray(iteration),
            )
        model.params, model.stats, model.opt_state = params, stats, opt_state
        info.elapsed_time = (time.time() - t0) * 1000.0

        # host-side scalar reads force a device sync; only do them at the
        # scalar-logging cadence (the reference syncs every iteration via
        # loss.item(), train.py:160 — each fetch is a full round trip
        # through the remote TPU runtime, so per-iter syncing dominates
        # step time; one batched device_get per sync keeps it to a single
        # round trip)
        sync_now = (
            (logging_active and crossed(rt.log_interval))
            or crossed(report_interval)
            or iteration >= op.iterations
        )
        if sync_now:
            m = jax.device_get(metrics)
            # liveness heartbeat for scripts/run_with_stall_guard.sh: the
            # device_get above proves the step stream is really advancing
            # (a hung axon tunnel RPC blocks exactly here — the Aug-19
            # stall left a leg in futex_do_wait for hours with the log
            # silent); guards watch this file's mtime and kill+resume.
            try:
                with open(f"/tmp/hairgs_tpu_heartbeat_{os.getpid()}", "w") as f:
                    f.write(str(iteration))
            except OSError:
                pass
            loss = float(m["loss"])
            check_finite(loss, iteration)
            info.loss = loss
            info.loss_dict = {
                k[5:]: float(v) for k, v in m.items() if k.startswith("loss/")
            }
            info.train_psnr = float(m["psnr"])
            ema_loss = 0.4 * loss + 0.6 * ema_loss

            n_prims = model.num_segments if is_hair else model.count
            overflow_pairs = int(m["overflow_pairs"])
            # overflow counters are summed over the K views of a step;
            # scale the per-view budget test accordingly
            new_budget = None if rt.freeze_tile_budget else budget_ctl.update(
                overflow_pairs, n_prims * view_batch,
                raster_cfg.max_tiles_per_gaussian
            )
            if new_budget is not None:
                verb = ("raising" if new_budget > raster_cfg.max_tiles_per_gaussian
                        else "shrinking")
                print(f"[raster] iter {iteration}: {overflow_pairs} truncated "
                      f"pairs — {verb} max_tiles_per_gaussian to {new_budget}")
                raster_cfg = make_raster_cfg(new_budget,
                                             raster_cfg.pair_capacity,
                                             raster_cfg.max_pairs_per_tile)
                step_fn = build_step()
                # persist the converged budget so a resumed run compiles once
                # instead of re-walking the 16->32->64 ladder (each recompile
                # costs minutes on the remote-compile TPU helper)
                args.max_tiles_per_gaussian = new_budget
                save_cfg_args(args.model_path, args)
            # compact pair-table capacity: grow immediately on truncation,
            # shrink on sustained low occupancy (see PairCapacityController)
            if (rt.pair_capacity == 0 and raster_cfg.pair_capacity > 0
                    and raster_cfg.use_pallas):
                overflow_cap = int(m.get("overflow_capacity", 0))
                demand = int(m.get("pairs_demand", 0))
                new_cap = cap_ctl.update(overflow_cap, demand,
                                         raster_cfg.pair_capacity)
                if new_cap is not None:
                    verb = "raising" if new_cap > raster_cfg.pair_capacity \
                        else "shrinking"
                    print(f"[raster] iter {iteration}: pair demand {demand} "
                          f"(capacity-truncated {overflow_cap}) — {verb} "
                          f"pair_capacity to {new_cap}")
                    raster_cfg = make_raster_cfg(
                        raster_cfg.max_tiles_per_gaussian, new_cap,
                        raster_cfg.max_pairs_per_tile)
                    step_fn = build_step()
            overflow_tiles = int(m["overflow_tiles"])
            # per-tile pair cap: grow on sustained tile-cap drops (gradient
            # starvation of the deepest pairs — the round-3 quality killer),
            # shrink back after a long clean streak
            new_mp = None if rt.freeze_tile_budget else tilecap_ctl.update(
                overflow_tiles, int(m.get("pairs_demand", 0)),
                raster_cfg.max_pairs_per_tile)
            if new_mp is not None:
                verb = ("raising" if new_mp > raster_cfg.max_pairs_per_tile
                        else "shrinking")
                print(f"[raster] iter {iteration}: {overflow_tiles} tile-cap "
                      f"dropped pairs — {verb} max_pairs_per_tile to {new_mp}")
                raster_cfg = make_raster_cfg(
                    raster_cfg.max_tiles_per_gaussian,
                    raster_cfg.pair_capacity, new_mp)
                step_fn = build_step()
                # persist like the tile budget: a resumed run compiles the
                # converged cap once instead of re-walking the ladder
                args.max_pairs_per_tile = new_mp
                save_cfg_args(args.model_path, args)
            overflow_cap_n = int(m.get("overflow_capacity", 0))
            overflow = overflow_tiles + overflow_pairs + overflow_cap_n
            if overflow and not gp.quiet:
                print(f"[warn] iter {iteration}: {overflow} binning overflows "
                      f"({overflow_pairs} pair-budget, {overflow_tiles} "
                      f"tile-cap, {overflow_cap_n} capacity)")
            if not gp.quiet and crossed(100):
                print(f"iter {iteration:6d}  loss {ema_loss:.5f}  "
                      f"psnr {info.train_psnr:.2f}  "
                      f"prims {n_prims}  {info.elapsed_time:.1f} ms")
        else:
            # don't re-log stale scalars on non-sync iterations
            info.loss = None
            info.loss_dict = None
            info.train_psnr = None

        # --- topology cadence (train.py:171-200). Host mirrors are chained
        # between densify and merge in the same event: device->host pulls
        # run at ~1 MB/s through the remote runtime, so every avoided pull
        # is seconds per event.
        topo_changed = False
        if topo_worker is not None:
            # async mode (hair only): the densify+merge event computes on a
            # worker thread from a snapshot taken at launch; the result is
            # installed by poll() a few iterations later with surviving rows
            # gathering their live device values. Opacity reset and growth
            # host-mutate surviving rows, so they stay synchronous and
            # force-settle any flight first.
            due_densify = (iteration < op.densify_until_iter
                           and iteration > op.densify_from_iter
                           and crossed(op.densification_interval))
            due_merge = crossed(op.merge_interval)
            due_reset = (iteration < op.densify_until_iter
                         and crossed(op.opacity_reset_interval))
            due_grow = crossed(op.growth_interval) and grow_allowed()
            force = due_reset or due_grow or iteration >= op.iterations
            if topo_worker.poll(force=force, training_info=info):
                topo_changed = True
            if due_reset:
                hair_reset_opacity(model)
            if due_grow:
                hair_growing(model, info, growth_length=op.growth_length)
                growth_events_done += 1
                topo_changed = True
            if due_densify or due_merge:
                size_th = (op.prune_max_radii_2d
                           if iteration > op.opacity_reset_interval else None)
                topo_worker.launch(densify=due_densify, merge=due_merge,
                                   extent=scene.cameras_extent,
                                   size_th=size_th)
        else:
            arrays_cache = None
            if iteration < op.densify_until_iter:
                if iteration > op.densify_from_iter and crossed(op.densification_interval):
                    size_th = op.prune_max_radii_2d if iteration > op.opacity_reset_interval else None
                    if is_hair:
                        _, arrays_cache = hair_densification(
                            model, scene.cameras_extent, size_th, info,
                            return_arrays=True)
                    else:
                        model.densification(scene.cameras_extent, size_th, info)
                    topo_changed = True
                if crossed(op.opacity_reset_interval):
                    if is_hair:
                        hair_reset_opacity(model)
                        arrays_cache = None  # opacity plane changed on device
                    else:
                        model.reset_opacity()
            if is_hair:
                if crossed(op.merge_interval):
                    hair_merging(model, info, arrays=arrays_cache)
                    topo_changed = True
                if crossed(op.growth_interval) and grow_allowed():
                    hair_growing(model, info, growth_length=op.growth_length)
                    growth_events_done += 1
                    topo_changed = True
        if is_hair and topo_changed:
            refresh_smooth()

        # --- 2D visualization grid (train.py:206-219; logged, not imshown —
        # set gp.vis2d with a display attached for the cv2 window)
        if crossed(gp.update_vis2d_frequency):
            from hairgs_tpu.visualization import create_subplots_from_dict

            imgs = {
                "render": (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8),
                "gt": (np.clip(np.asarray(cam.image), 0, 1) * 255).astype(np.uint8),
            }
            info.composed_image = create_subplots_from_dict(imgs, 1280, 480)
            if gp.vis2d:
                try:
                    import cv2

                    cv2.imshow("Image Grid",
                               cv2.cvtColor(info.composed_image, cv2.COLOR_RGB2BGR))
                    cv2.waitKey(1)
                except Exception as e:
                    print(f"[vis2d] disabled ({e})")
                    gp.vis2d = False
            # live 3D strand view (reference train.py:222-227)
            if vis3d_plotter is not None:
                from hairgs_tpu.visualization import update_polydata_from_hair

                update_polydata_from_hair(vis3d_polydata, model)
                vis3d_plotter.render()
                if hasattr(vis3d_plotter, "app"):
                    vis3d_plotter.app.processEvents()
        else:
            info.composed_image = None

        # --- eval / log / save
        if crossed(gp.eval_frequency) or iteration >= op.iterations:
            if scene.gt is not None:
                info.eval_metrics, info.eval_thresholds = run_eval(
                    final=iteration >= op.iterations
                )
            run_image_eval()
        else:
            info.image_metrics = None
        logger.log(info, model)
        if crossed(gp.save_frequency) or iteration >= op.iterations:
            path = scene.save(iteration)
            print(f"\n[ITER {iteration}] Saved scene to {path}")

    if profiling:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {profile_dir}")
    if vis3d_plotter is not None:  # reference train.py:263-265
        vis3d_plotter.close()
    total = time.time() - start_time
    print(f"Training completed in {total:.1f}s "
          f"({iteration / max(total, 1e-9):.2f} it/s, "
          f"{step_count / max(total, 1e-9):.2f} steps/s)")
    logger.close()
    return scene, model


if __name__ == "__main__":
    parser = ArgumentParser(description="Training script parameters")
    add_config_args(parser, ModelConfig)
    add_config_args(parser, OptimizationConfig)
    add_config_args(parser, GeneralConfig)
    add_config_args(parser, RuntimeConfig)
    args = parser.parse_args(sys.argv[1:])
    # resume: adopt a previously persisted (converged) tile budget unless the
    # flag was given explicitly on this command line
    stored = load_cfg_args(args.model_path) if args.model_path else None
    if (stored is not None
            and hasattr(stored, "max_tiles_per_gaussian")
            and not any(a.startswith("--max_tiles_per_gaussian")
                        for a in sys.argv)):
        args.max_tiles_per_gaussian = stored.max_tiles_per_gaussian
    prepare_output_path(args)
    from hairgs_tpu.system import safe_state

    safe_state(getattr(args, "quiet", False))
    training(
        extract_config(args, ModelConfig),
        extract_config(args, OptimizationConfig),
        extract_config(args, GeneralConfig),
        extract_config(args, RuntimeConfig),
        args,
    )
