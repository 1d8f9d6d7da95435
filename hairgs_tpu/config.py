"""Configuration dataclasses + CLI plumbing.

Field names and defaults mirror the reference flag surface exactly
(arguments/__init__.py:55-125: ModelParams / OptimizationParams /
GeneralParams) so command lines transfer 1:1. `cfg_args` persistence follows
utils/system.py:41-54 / arguments/__init__.py:128-148.
"""

import dataclasses
import os
from argparse import ArgumentParser, BooleanOptionalAction, Namespace
from typing import Optional


@dataclasses.dataclass
class ModelConfig:
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    sh_degree: int = 0  # reference default 0 (arguments/__init__.py:60)
    resolution: int = -1
    data_device: str = "tpu"
    eval: bool = False


@dataclasses.dataclass
class OptimizationConfig:
    # Common (arguments/__init__.py:72-111)
    iterations: int = 30000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    scaling_lr: float = 0.005
    feature_lr: float = 0.025
    opacity_lr: float = 0.05
    mask_lr: float = 0.01
    lambda_dssim: float = 0.2
    lambda_orientation: float = 100.0
    lambda_mask: float = 0.01
    pval: float = 0.05
    bidirectional_eval: bool = True
    # GS specific
    rotation_lr: float = 0.001
    # Hair-GS specific
    lambda_smooth: float = 0.005
    lambda_magnet: float = 0.0
    bidirectional_merge: bool = False
    num_points_strand: int = 80
    merge_interval: int = 100
    merge_dist_th_init: float = 2e-3
    merge_dist_th_final: float = 4e-3
    merge_angle_th_init: float = 20.0
    merge_angle_th_final: float = 40.0
    growth_interval: int = 100000
    growth_averaging_points: int = 3
    # Round-5 in-loop growth safeguards (the measured Stage-II.5 recipe,
    # BASELINE.md: 2 x 2mm tip events + merge pass = F1 0.5180 -> 0.5310;
    # the reference's growing() is both broken and interval-disabled
    # upstream, so these two knobs have no reference analogue):
    growth_length: float = 0.002  # per-event tip extension (meters)
    growth_max_events: int = 0  # stop in-loop growth after N events
    # (0 = unlimited, the reference cadence semantics)
    # Densification
    percent_dense: float = 0.01
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 27000  # iterations * 0.9
    densification_interval: int = 100
    prune_max_radii_2d: int = 1000
    densify_grad_threshold: float = 0.0002


@dataclasses.dataclass
class GeneralConfig:
    quiet: bool = False
    logger: str = "tensorboard"
    ip: str = "127.0.0.1"
    port: int = 6009
    vis2d: bool = False
    update_vis2d_frequency: int = 30000
    vis3d: bool = False
    save_frequency: int = 5000
    eval_frequency: int = 30000


@dataclasses.dataclass
class RuntimeConfig:
    """TPU-specific knobs with no reference equivalent."""

    view_batch: int = 1  # cameras per step, sharded over the mesh data axis
    mesh_max_devices: int = 0  # cap on the view-DP mesh size; 0 = all local devices
    gauss_shard: int = 1  # >1: depth-slab shard the Gaussian axis over this
    # many devices (scale-out for scenes whose pair tables outgrow one chip;
    # composes with view_batch via a (data x gauss) 2D mesh)
    max_tiles_per_gaussian: int = 16
    freeze_tile_budget: bool = False  # pin max_tiles_per_gaussian (disable
    # the adaptive grow/shrink controller; each budget change recompiles the
    # step, minutes on the remote compile helper)
    max_pairs_per_tile: int = 2048
    composite_chunk: int = 128
    pair_capacity: int = 0  # compact paged pair-table size in slots. 0 =
    # adaptive (driver starts near the measured demand and re-buckets, one
    # recompile per change); -1 = worst-case n*max_tiles sizing (round-3
    # behavior: 6-9x padding at hair scale but never capacity-truncates);
    # >0 = fixed slot count (rounded up to the chunk)
    pair_capacity_round: int = 131072  # adaptive pair-capacity bucket granule
    dma_lookahead: bool = True  # cross-tile DMA prefetch in the pallas
    # compositor kernels. Scheduling-only: proven bit-identical (images AND
    # grads) on real hardware by the round-5 parity gate, and +13% on the
    # solo bench (_runs/perf_r4/bench_compact_lookahead.json) — default-on
    # since round 5. XLA path ignores it.
    capacity_round: int = 4096
    use_pallas: str = "auto"  # auto: pallas kernels on TPU, XLA path elsewhere
    feat_bf16: bool = False  # bf16 feature plane in the pair table (~4% step
    # speedup; feature values/gradients round to bf16, geometry stays f32)
    antialiasing: bool = False  # Mip-Splatting dilation compensation: scale
    # opacity by sqrt(det(cov)/det(cov+0.3I)) (opt-in; the reference keeps
    # the +0.3px low-pass uncompensated)
    alpha_min: float = 1.0 / 255.0  # per-pair alpha gate (reference value
    # 1/255, forward.cu:343-351). Splats below the gate get zero gradient;
    # lower it (e.g. 1e-5) for --antialiasing legs on models trained without
    # AA, whose compensated alphas would otherwise freeze below the gate
    device_eval: str = "auto"  # auto: device-side in-training metrics on TPU
    # (final eval always uses the host oracle incl. strand consistency)
    log_interval: int = 10  # scalar-logging/sync cadence (each sync is a
    # host round trip through the remote TPU runtime; the reference syncs
    # every iteration via loss.item(), train.py:160)
    profile_steps: int = 0  # >0: capture a jax.profiler trace of these steps
    debug: bool = False  # jax_debug_nans + state dump on non-finite loss
    async_topology: bool = False  # hair densify/merge events compute on a
    # background thread from a device snapshot while training continues;
    # surviving rows keep live values at apply. Deviation from reference
    # semantics: strategies see snapshot-time stats and land a few
    # iterations late (topo/async_events.py)


_SHORTHANDS = {"source_path": "s", "model_path": "m", "images": "i", "resolution": "r"}


def add_config_args(parser: ArgumentParser, cls, defaults=None) -> None:
    inst = defaults if defaults is not None else cls()
    for f in dataclasses.fields(cls):
        value = getattr(inst, f.name)
        names = ["--" + f.name]
        if f.name in _SHORTHANDS:
            names.append("-" + _SHORTHANDS[f.name])
        if f.type is bool or isinstance(value, bool):
            # BooleanOptionalAction so default-True flags (bidirectional_eval)
            # get a working --no-X form; the reference's store_true pattern
            # (arguments/__init__.py:36-46) only has default-False flags.
            parser.add_argument(*names, default=value, action=BooleanOptionalAction)
        else:
            parser.add_argument(*names, default=value, type=type(value))


def extract_config(args: Namespace, cls):
    kwargs = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(cls)
        if hasattr(args, f.name)
    }
    return cls(**kwargs)


def save_cfg_args(model_path: str, args: Namespace) -> None:
    """Persist flags as a Namespace repr, reference utils/system.py:53-54."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(repr(args))


def load_cfg_args(model_path: str) -> Optional[Namespace]:
    path = os.path.join(model_path, "cfg_args")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        text = f.read()
    return eval(text, {"Namespace": Namespace})  # noqa: S307 - same as reference


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """Merge stored cfg_args with CLI overrides (arguments/__init__.py:128-148)."""
    args_cmdline = parser.parse_args(argv)
    stored = None
    if getattr(args_cmdline, "model_path", None):
        stored = load_cfg_args(args_cmdline.model_path)
    merged = vars(stored).copy() if stored is not None else {}
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
