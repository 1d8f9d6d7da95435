"""Stage-I Gaussian point model on capacity-padded arenas.

Parity target: reference scene/gaussian_model.py (GaussianModel) — parameters
xyz / features_dc / features_rest / scaling(log) / rotation(quat wxyz) /
opacity(logit) / mask(logit) (l.45-51), activations (l.60-78), per-group Adam
with exponential xyz LR decay (l.210-258), densify clone/split/prune
(l.544-673), opacity reset (l.414-419), segment-endpoint extraction
(l.706-725) and conversion to the hair model (l.797-859).

TPU-first redesign: instead of reallocating tensors on every topology change
(which would retrigger XLA compilation), parameters + Adam moments live in
fixed-capacity arrays with an `active` row mask; the jitted train step never
changes shape. Topology ops run host-side (numpy) at the same infrequent
cadence the reference runs its optimizer-state surgery, then write back into
a (possibly re-bucketed) arena.
"""

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hairgs_tpu.core.maths import inverse_sigmoid, pval_to_dist_to_scale_factor
from hairgs_tpu.core.sh import RGB2SH
from hairgs_tpu.core.transforms import build_rotation
from hairgs_tpu.optim import AdamState, adam_init
from hairgs_tpu.ops.knn import mean_sq_dist_3nn

OPACITY_TH = 0.005  # scene/gaussian_model.py:37
FG_BIN_TH = 0.25  # scene/gaussian_model.py:38 foreground_binarization_th

# fused feature-channel layout for the single-pass renderer
RGB = slice(0, 3)
MASK = 3
ORIENT = slice(4, 7)
NUM_CHANNELS = 7


class GaussianParams(NamedTuple):
    xyz: jnp.ndarray  # (N,3)
    features_dc: jnp.ndarray  # (N,1,3)
    features_rest: jnp.ndarray  # (N,K-1,3)
    scaling: jnp.ndarray  # (N,3) log-space
    rotation: jnp.ndarray  # (N,4) wxyz
    opacity: jnp.ndarray  # (N,1) logit
    mask: jnp.ndarray  # (N,1) logit


class GaussianStats(NamedTuple):
    max_radii2d: jnp.ndarray  # (N,)
    xyz_grad_accum: jnp.ndarray  # (N,1)
    denom: jnp.ndarray  # (N,1)


def gaussian_activations(p: GaussianParams):
    from hairgs_tpu.core.maths import safe_norm

    # safe norm: zero-initialized padding rows get zero (not NaN) gradients
    qnorm = jnp.maximum(safe_norm(p.rotation, axis=-1, keepdims=True), 1e-12)
    return {
        "scaling": jnp.exp(p.scaling),
        "rotation": p.rotation / qnorm,
        "opacity": jax.nn.sigmoid(p.opacity),
        "mask": jax.nn.sigmoid(p.mask),
    }


def gaussian_orientation(p: GaussianParams):
    """World direction of the principal (longest-scale) axis; reference
    scene/gaussian_model.py:145-152 (get_orientation)."""
    scale = jnp.exp(p.scaling)
    rots = build_rotation(p.rotation)
    main_axis = jax.nn.one_hot(jnp.argmax(scale, axis=1), 3, dtype=scale.dtype)
    return jnp.einsum("nij,nj->ni", rots, main_axis)


def gaussian_render_inputs(p: GaussianParams, cam_center, active_sh_degree: int):
    """Build the fused multi-channel renderer inputs.

    Channels: rgb (SH-evaluated, clamp>=0), sigmoid(mask), world orientation —
    the reference renders these in three separate rasterizer calls
    (train.py:146, loss/losses.py:247,312); geometry and sort are identical so
    one pass is mathematically equivalent (bg=0 in training).
    """
    from hairgs_tpu.render.renderer import sh_to_color

    act = gaussian_activations(p)
    rgb = sh_to_color(p.features_dc, p.features_rest, p.xyz, cam_center,
                      active_sh_degree, 0)
    orient = gaussian_orientation(p)
    features = jnp.concatenate([rgb, act["mask"], orient], axis=-1)
    return dict(
        means3d=p.xyz,
        scales=act["scaling"],
        rotations=act["rotation"],
        opacity=act["opacity"][:, 0],
        features=features,
    )


def _round_capacity(n: int, bucket: int) -> int:
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


def _pad_to(arr: np.ndarray, capacity: int) -> np.ndarray:
    pad = capacity - arr.shape[0]
    if pad == 0:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)], axis=0)


@dataclasses.dataclass
class GaussianModel:
    """Host-side wrapper orchestrating the padded device state.

    Mirrors the reference GaussianModel API surface; the hot loop consumes
    `.params/.active/.stats/.opt_state` directly.
    """

    sh_degree: int = 3
    spatial_lr_scale: float = 1.0
    capacity_round: int = 4096

    params: Optional[GaussianParams] = None
    active: Optional[jnp.ndarray] = None
    stats: Optional[GaussianStats] = None
    opt_state: Optional[AdamState] = None
    count: int = 0
    active_sh_degree: int = 0
    pval: float = 0.05
    dist_to_scale_factor: float = pval_to_dist_to_scale_factor(0.05)
    training_args: Optional[object] = None
    _rng: np.random.Generator = dataclasses.field(
        default_factory=lambda: np.random.default_rng(0)
    )

    # -- setup -----------------------------------------------------------

    @property
    def max_sh_degree(self) -> int:
        return self.sh_degree

    @property
    def capacity(self) -> int:
        return 0 if self.params is None else self.params.xyz.shape[0]

    def set_pval(self, pval: float):
        self.pval = pval
        self.dist_to_scale_factor = pval_to_dist_to_scale_factor(pval)

    def set_dist_to_scale_factor(self, factor: float):
        from hairgs_tpu.core.maths import dist_to_scale_factor_to_pval

        self.dist_to_scale_factor = factor
        self.pval = dist_to_scale_factor_to_pval(factor)

    def oneup_sh_degree(self):
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    def create_from_pcd(self, points: np.ndarray, colors: np.ndarray):
        """Initialize from a point cloud; scene/gaussian_model.py:163-208.

        Initial scale = log(sqrt(mean squared distance to 3-NN)) replicated on
        all axes; opacity 0.1, mask 0.5, identity rotation."""
        n = points.shape[0]
        dist2 = np.asarray(mean_sq_dist_3nn(jnp.asarray(points, dtype=jnp.float32)))
        dist2 = np.maximum(dist2, 1e-7)
        scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1).astype(np.float32)
        rots = np.zeros((n, 4), dtype=np.float32)
        rots[:, 0] = 1.0
        num_coeffs = (self.max_sh_degree + 1) ** 2
        f_dc = RGB2SH(np.asarray(colors, dtype=np.float32))[:, None, :]
        f_rest = np.zeros((n, num_coeffs - 1, 3), dtype=np.float32)
        inv_sig = lambda x: math.log(x / (1 - x))
        arrays = dict(
            xyz=np.asarray(points, dtype=np.float32),
            features_dc=np.asarray(f_dc, dtype=np.float32),
            features_rest=f_rest,
            scaling=scales,
            rotation=rots,
            opacity=np.full((n, 1), inv_sig(0.1), dtype=np.float32),
            mask=np.full((n, 1), inv_sig(0.5), dtype=np.float32),
        )
        self._install(arrays, n)

    def _install(self, arrays: dict, count: int, moments: Optional[dict] = None,
                 step: int = 0, moment_maps=None):
        """Write host arrays into a (re)padded device arena.

        moment_maps: (src, zero_planes) gather-or-zero map into the CURRENT
        opt_state rows (-1 = zero-init) — the Adam carry is applied on
        device, avoiding the ~1 MB/s device->host pull of the moment
        arenas (CLAUDE.md)."""
        cap = _round_capacity(count, self.capacity_round)

        remapped = None
        if moment_maps is not None and self.opt_state is not None:
            src, zero_planes = moment_maps
            # capacity-shaped map: count-dependent shapes would recompile
            # the eager gathers every event through the remote helper
            src_cap = np.full(cap, -1, np.int64)
            src_cap[: src.shape[0]] = src
            idx = jnp.asarray(np.clip(src_cap, 0, None).astype(np.int32))
            live = jnp.asarray(src_cap >= 0)

            def take(name, arr):
                if name in zero_planes:
                    return jnp.zeros((cap,) + arr.shape[1:], arr.dtype)
                g = arr[idx]
                return jnp.where(
                    live.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0)

            def remap_tree(tree):
                return GaussianParams(
                    **{k: take(k, v) for k, v in tree._asdict().items()})

            remapped = AdamState(
                mu=remap_tree(self.opt_state.mu),
                nu=remap_tree(self.opt_state.nu),
                step=jnp.asarray(step, jnp.int32),
            )

        padded = {k: jnp.asarray(_pad_to(v, cap)) for k, v in arrays.items()}
        self.params = GaussianParams(**padded)
        self.active = jnp.arange(cap) < count
        self.count = count
        self.stats = GaussianStats(
            max_radii2d=jnp.zeros((cap,), jnp.float32),
            xyz_grad_accum=jnp.zeros((cap, 1), jnp.float32),
            denom=jnp.zeros((cap, 1), jnp.float32),
        )
        if remapped is not None:
            self.opt_state = remapped
        elif moments is None:
            self.opt_state = adam_init(self.params)
        else:
            mu = GaussianParams(**{k: jnp.asarray(_pad_to(v, cap)) for k, v in moments["mu"].items()})
            nu = GaussianParams(**{k: jnp.asarray(_pad_to(v, cap)) for k, v in moments["nu"].items()})
            self.opt_state = AdamState(mu=mu, nu=nu, step=jnp.asarray(step, jnp.int32))

    def training_setup(self, training_args):
        self.training_args = training_args
        self.set_pval(training_args.pval)
        if self.opt_state is None and self.params is not None:
            self.opt_state = adam_init(self.params)

    # -- host-side views -------------------------------------------------

    def host_arrays(self) -> dict:
        # slice on device, one batched pull (pad rows never cross the ~1 MB/s
        # device->host link; see core/hostsync.py)
        from hairgs_tpu.core.hostsync import sliced_pull

        c = self.count
        return sliced_pull(
            {k: (v, c) for k, v in self.params._asdict().items()})

    def host_moments(self) -> dict:
        from hairgs_tpu.core.hostsync import sliced_pull

        c = self.count
        pulled = sliced_pull({
            **{f"mu/{k}": (v, c)
               for k, v in self.opt_state.mu._asdict().items()},
            **{f"nu/{k}": (v, c)
               for k, v in self.opt_state.nu._asdict().items()},
        })
        out = {"mu": {}, "nu": {}}
        for key, v in pulled.items():
            g, k = key.split("/", 1)
            out[g][k] = v
        return out

    # convenience numpy activations (host-side topology code)
    def np_scaling(self, arrays):
        return np.exp(arrays["scaling"])

    def np_opacity(self, arrays):
        return 1.0 / (1.0 + np.exp(-arrays["opacity"]))

    def np_mask(self, arrays):
        return 1.0 / (1.0 + np.exp(-arrays["mask"]))

    # -- topology ops (host-side, reference semantics) -------------------

    def reset_opacity(self):
        """opacity <- inverse_sigmoid(min(opacity, 0.01)), moments zeroed
        (scene/gaussian_model.py:414-419)."""
        arrays = self.host_arrays()
        opa = self.np_opacity(arrays)
        new = np.log(np.minimum(opa, 0.01) / (1 - np.minimum(opa, 0.01)))
        arrays["opacity"] = new.astype(np.float32)
        step = int(self.opt_state.step)
        self._install(arrays, self.count, step=step,
                      moment_maps=(np.arange(self.count), frozenset({"opacity"})))

    def densification(self, extent: float, max_screen_size, training_info=None):
        """Clone + split + prune; scene/gaussian_model.py:636-673.

        Stats (grad accum / denom / max_radii2d) are read before and reset to
        zero after, exactly as densification_postfix does (l.538-542)."""
        arrays = self.host_arrays()
        # moments stay on device: surgery is tracked as a gather-or-zero
        # index map and applied by _install (device->host is ~1 MB/s)
        src = np.arange(self.count, dtype=np.int64)
        stats_np = {
            "max_radii2d": np.asarray(self.stats.max_radii2d)[: self.count],
            "xyz_grad_accum": np.asarray(self.stats.xyz_grad_accum)[: self.count],
            "denom": np.asarray(self.stats.denom)[: self.count],
        }
        ta = self.training_args
        grads = stats_np["xyz_grad_accum"] / stats_np["denom"]
        grads = np.nan_to_num(grads, nan=0.0)
        max_grad = ta.densify_grad_threshold
        split_threshold = ta.percent_dense * extent

        info = {}

        def cat(arrays, src, sel):
            new = {k: np.concatenate([v, v[sel]], axis=0) for k, v in arrays.items()}
            src = np.concatenate([src, np.full(int(sel.sum()), -1, np.int64)])
            return new, src

        # --- clone (l.602-634): small gaussians with large view grad
        scaling = self.np_scaling(arrays)
        sel = (np.linalg.norm(grads, axis=-1) >= max_grad) & (
            scaling.max(axis=1) <= split_threshold
        )
        info["clone"] = int(sel.sum())
        arrays, src = cat(arrays, src, sel)

        # --- split (l.544-600): large gaussians; sample N=2 from the pdf
        n_now = arrays["xyz"].shape[0]
        padded_grad = np.zeros(n_now, dtype=np.float32)
        padded_grad[: grads.shape[0]] = grads.squeeze(-1)
        scaling = self.np_scaling(arrays)
        sel = (padded_grad >= max_grad) & (scaling.max(axis=1) > split_threshold)
        n_split = int(sel.sum())
        info["split"] = n_split
        if n_split > 0:
            N = 2
            stds = np.tile(scaling[sel], (N, 1))
            samples = self._rng.normal(0.0, stds).astype(np.float32)
            rots = np.asarray(build_rotation(jnp.asarray(arrays["rotation"][sel])))
            rots = np.tile(rots, (N, 1, 1))
            new_xyz = np.einsum("nij,nj->ni", rots, samples) + np.tile(
                arrays["xyz"][sel], (N, 1)
            )
            new_scaling = np.log(np.tile(scaling[sel], (N, 1)) / (0.8 * N)).astype(
                np.float32
            )
            add = {
                "xyz": new_xyz.astype(np.float32),
                "scaling": new_scaling,
                "rotation": np.tile(arrays["rotation"][sel], (N, 1)),
                "features_dc": np.tile(arrays["features_dc"][sel], (N, 1, 1)),
                "features_rest": np.tile(arrays["features_rest"][sel], (N, 1, 1)),
                "opacity": np.tile(arrays["opacity"][sel], (N, 1)),
                "mask": np.tile(arrays["mask"][sel], (N, 1)),
            }
            arrays = {k: np.concatenate([v, add[k]], axis=0) for k, v in arrays.items()}
            src = np.concatenate([src, np.full(new_xyz.shape[0], -1, np.int64)])
            keep = np.ones(arrays["xyz"].shape[0], dtype=bool)
            keep[:n_now][sel] = False  # prune split originals
            arrays = {k: v[keep] for k, v in arrays.items()}
            src = src[keep]

        # --- prune (l.646-670)
        opa = self.np_opacity(arrays)[:, 0]
        prune = opa < OPACITY_TH
        info["prune_low_opacity"] = int(prune.sum())
        if max_screen_size:
            # max_radii2d was implicitly reset by clone/split postfix in the
            # reference; new rows here have no radii either — only originals
            # could trigger, but reference zeroes them too, so skip vs-radii
            # and apply the world-space test only (same net behavior).
            scaling = self.np_scaling(arrays)
            big_ws = scaling.max(axis=1) > 0.1 * extent
            info["prune_big_ws"] = int(big_ws.sum())
            prune = prune | big_ws
        info["prune_total"] = int(prune.sum())
        if prune.sum() != arrays["xyz"].shape[0]:
            keep = ~prune
            arrays = {k: v[keep] for k, v in arrays.items()}
            src = src[keep]

        if training_info is not None:
            training_info.densification_info.update(info)
        self._install(arrays, arrays["xyz"].shape[0],
                      step=int(self.opt_state.step),
                      moment_maps=(src, frozenset()))
        return info

    # -- checkpoint I/O --------------------------------------------------

    def save_ply(self, path: str):
        from hairgs_tpu.io.ply import save_gaussian_ply

        save_gaussian_ply(path, self.host_arrays())

    def load_ply(self, path: str):
        from hairgs_tpu.io.ply import load_gaussian_ply

        arrays = load_gaussian_ply(path, self.max_sh_degree)
        self._install(arrays, arrays["xyz"].shape[0])
        self.active_sh_degree = self.max_sh_degree

    # -- conversion ------------------------------------------------------

    def to_hair_model(self, ref_strand_root: np.ndarray):
        """Convert to a HairModel: each Gaussian becomes a disconnected line
        segment (scene/gaussian_model.py:797-859). Width = mean of the two
        minor scales (log space); endpoint_pairs = [(i, i+N)]."""
        from hairgs_tpu.models.hair import HairModel
        from hairgs_tpu.topo.strands import update_strand_root, compute_strands_info

        arrays = self.host_arrays()
        n = arrays["xyz"].shape[0]
        endpoints2 = self.get_segment_endpoints_np(arrays)  # (N,2,3)
        endpoints = np.concatenate([endpoints2[:, 0], endpoints2[:, 1]], axis=0)
        scale = self.np_scaling(arrays)
        axis_idx = np.argmax(scale, axis=1)
        other = np.ones_like(scale)
        other[np.arange(n), axis_idx] = 0
        width = np.mean(scale * other, axis=1, keepdims=True)
        width = np.log(np.maximum(width, 1e-12)).astype(np.float32)
        pairs = np.stack([np.arange(n), np.arange(n) + n], axis=1).astype(np.int32)

        hair = HairModel(
            sh_degree=self.max_sh_degree,
            spatial_lr_scale=self.spatial_lr_scale,
            capacity_round=self.capacity_round,
        )
        hair.set_dist_to_scale_factor(float(self.dist_to_scale_factor))
        hair.active_sh_degree = self.active_sh_degree
        hair.install(
            endpoints,
            pairs,
            dict(
                features_dc=arrays["features_dc"],
                features_rest=arrays["features_rest"],
                opacity=arrays["opacity"],
                mask=arrays["mask"],
                width=width,
            ),
        )
        hair.ref_strand_root = ref_strand_root
        update_strand_root(hair)
        compute_strands_info(hair)
        if self.training_args is not None:
            hair.training_setup(self.training_args)
        return hair

    def get_segment_endpoints_np(self, arrays=None) -> np.ndarray:
        """(N,2,3) endpoints mu +- R (argmax-scale axis * sigma / factor);
        scene/gaussian_model.py:706-725."""
        if arrays is None:
            arrays = self.host_arrays()
        scale = self.np_scaling(arrays)
        axis_idx = np.argmax(scale, axis=1)
        main_axis = np.zeros_like(scale)
        main_axis[np.arange(scale.shape[0]), axis_idx] = 1.0
        dist = main_axis * scale * (1.0 / self.dist_to_scale_factor)
        rots = np.asarray(build_rotation(jnp.asarray(arrays["rotation"])))
        rotated = np.einsum("nij,nj->ni", rots, dist)
        center = arrays["xyz"]
        return np.stack([center + rotated, center - rotated], axis=1)

    def compute_foreground_mask_np(self, arrays=None, lines_only: bool = False) -> np.ndarray:
        """opacity >= th AND mask >= binarization th; with lines_only, keep
        only gaussians elongated along exactly one axis with thin round minor
        axes (scene/gaussian_model.py:727-795)."""
        if arrays is None:
            arrays = self.host_arrays()
        mask = (self.np_opacity(arrays)[:, 0] >= OPACITY_TH) & (
            self.np_mask(arrays)[:, 0] >= FG_BIN_TH
        )
        if lines_only:
            factor_threshold = 5
            eps = 1e-1
            radius_threshold = 2.5e-5
            s = self.np_scaling(arrays)
            scale_th = radius_threshold * self.dist_to_scale_factor

            def line_along(i, j, k):
                # axis i dominant; j,k similar and thin
                cond = (s[:, i] / s[:, j] > factor_threshold) & (
                    s[:, i] / s[:, k] > factor_threshold
                )
                ratio = s[:, j] / s[:, k]
                # reference l.745-751: the or-clause is a tautology as written;
                # replicated faithfully (any ratio passes)
                cond &= (ratio > 1 - eps) | (ratio < 1 + eps)
                cond &= (s[:, j] <= scale_th) & (s[:, k] <= scale_th)
                return cond

            x_line = line_along(0, 1, 2)
            y_line = line_along(1, 0, 2)
            z_line = line_along(2, 0, 1)
            mask &= x_line ^ y_line ^ z_line
        return mask

    # -- full-state checkpointing (capture/restore equivalent) -----------

    def capture(self) -> dict:
        """Full optimization state incl. Adam moments — the reference's
        capture tuple (scene/gaussian_model.py:80-95) exists but is unused by
        its drivers (PLY checkpoints lose optimizer state); here it is a
        working npz payload."""
        c = self.count
        state = {f"param/{k}": np.asarray(v)[:c] for k, v in self.params._asdict().items()}
        state.update({f"mu/{k}": np.asarray(v)[:c] for k, v in self.opt_state.mu._asdict().items()})
        state.update({f"nu/{k}": np.asarray(v)[:c] for k, v in self.opt_state.nu._asdict().items()})
        state["step"] = np.asarray(int(self.opt_state.step))
        state["active_sh_degree"] = np.asarray(self.active_sh_degree)
        state["spatial_lr_scale"] = np.asarray(self.spatial_lr_scale)
        state["stats/max_radii2d"] = np.asarray(self.stats.max_radii2d)[:c]
        state["stats/xyz_grad_accum"] = np.asarray(self.stats.xyz_grad_accum)[:c]
        state["stats/denom"] = np.asarray(self.stats.denom)[:c]
        return state

    def save_checkpoint(self, path: str):
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, **self.capture())

    def restore(self, state: dict):
        params = {k.split("/", 1)[1]: np.array(v) for k, v in state.items()
                  if k.startswith("param/")}
        mom = {
            "mu": {k.split("/", 1)[1]: np.array(v) for k, v in state.items()
                   if k.startswith("mu/")},
            "nu": {k.split("/", 1)[1]: np.array(v) for k, v in state.items()
                   if k.startswith("nu/")},
        }
        self._install(params, params["xyz"].shape[0], moments=mom,
                      step=int(state["step"]))
        self.active_sh_degree = int(state["active_sh_degree"])
        self.spatial_lr_scale = float(state["spatial_lr_scale"])
        cap = self.capacity
        c = self.count

        def pad1(v, like):
            out = np.zeros_like(np.asarray(like))
            out[:c] = v
            return jnp.asarray(out)

        self.stats = GaussianStats(
            max_radii2d=pad1(state["stats/max_radii2d"], self.stats.max_radii2d),
            xyz_grad_accum=pad1(state["stats/xyz_grad_accum"], self.stats.xyz_grad_accum),
            denom=pad1(state["stats/denom"], self.stats.denom),
        )

    def load_checkpoint(self, path: str):
        self.restore(dict(np.load(path)))

    def clean_gaussians(self):
        arrays = self.host_arrays()
        keep = self.compute_foreground_mask_np(arrays)
        arrays = {k: v[keep] for k, v in arrays.items()}
        src = np.arange(self.count, dtype=np.int64)[keep]
        self._install(arrays, arrays["xyz"].shape[0],
                      step=int(self.opt_state.step),
                      moment_maps=(src, frozenset()))
