"""Stage-II/III strand-graph model (HairGS) on capacity-padded arenas.

Parity target: reference scene/hair_gaussian_model.py — learnable endpoints
(E,3) plus an integer segment graph endpoint_pairs (S,2); per-segment
features/opacity/mask/width. All Gaussian parameters are *derived* from the
endpoints (l.134-201): scaling from segment length + width, rotation aligning
x-axis to the segment, xyz = midpoint, orientation = normalized direction —
in JAX these are just pure functions and jax.grad differentiates through them
for free (the reference relies on torch autograd the same way).

Topology ops (split/clone/merge/collapse/prune/grow, l.788-1203) run
host-side between jitted steps, mirroring reference semantics; see
hairgs_tpu/topo/.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hairgs_tpu.core.maths import MIN_VAL, pval_to_dist_to_scale_factor, safe_norm
from hairgs_tpu.core.transforms import quaternion_between_vectors
from hairgs_tpu.models.gaussian import (
    FG_BIN_TH,
    OPACITY_TH,
    GaussianStats,
    _pad_to,
    _round_capacity,
)
from hairgs_tpu.optim import AdamState, adam_init


class HairParams(NamedTuple):
    """Differentiable leaves. endpoints is (E,3); everything else (S,...)."""

    endpoints: jnp.ndarray  # (E,3)
    features_dc: jnp.ndarray  # (S,1,3)
    features_rest: jnp.ndarray  # (S,K-1,3)
    opacity: jnp.ndarray  # (S,1) logit
    mask: jnp.ndarray  # (S,1) logit
    width: jnp.ndarray  # (S,1) log


class HairGraph(NamedTuple):
    """Non-differentiable topology state (int arrays, padded)."""

    endpoint_pairs: jnp.ndarray  # (S,2) int32
    seg_active: jnp.ndarray  # (S,) bool
    ep_active: jnp.ndarray  # (E,) bool


def hair_derived(p: HairParams, graph: HairGraph, dist_to_scale_factor: float):
    """Derived per-segment Gaussian parameters (hair_gaussian_model.py:134-201)."""
    pairs = p.endpoints[graph.endpoint_pairs]  # (S,2,3)
    diff = pairs[:, 1] - pairs[:, 0]
    norm = safe_norm(diff, axis=-1, keepdims=True)
    # scaling (l.134-145): x from half-length * factor, yz from width
    scale_x = jnp.clip(norm / 2.0 * dist_to_scale_factor, MIN_VAL, None)
    scale_yz = jnp.exp(jnp.repeat(p.width, 2, axis=1))
    scaling = jnp.concatenate([scale_x, scale_yz], axis=1)
    # rotation (l.147-165): align +x to the segment; identity for collapsed
    valid = norm[:, 0] > MIN_VAL
    v1 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), diff.shape)
    safe_diff = jnp.where(valid[:, None], diff, v1)
    quat = quaternion_between_vectors(v1, safe_diff)
    identity = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0]), quat.shape)
    rotation = jnp.where(valid[:, None], quat, identity)
    # xyz = midpoint (l.167-172)
    xyz = jnp.mean(pairs, axis=1)
    # orientation (l.188-201): normalized direction, +x for collapsed
    direction = jnp.where(valid[:, None], diff / jnp.maximum(norm, MIN_VAL), v1)
    return dict(xyz=xyz, scaling=scaling, rotation=rotation, orientation=direction)


def hair_render_inputs(p: HairParams, graph: HairGraph, cam_center,
                       active_sh_degree: int, dist_to_scale_factor: float):
    """Fused multi-channel renderer inputs for the hair model."""
    from hairgs_tpu.render.renderer import sh_to_color

    d = hair_derived(p, graph, dist_to_scale_factor)
    rgb = sh_to_color(p.features_dc, p.features_rest, d["xyz"], cam_center,
                      active_sh_degree, 0)
    mask_v = jax.nn.sigmoid(p.mask)
    features = jnp.concatenate([rgb, mask_v, d["orientation"]], axis=-1)
    return dict(
        means3d=d["xyz"],
        scales=d["scaling"],
        rotations=d["rotation"],
        opacity=jax.nn.sigmoid(p.opacity)[:, 0],
        features=features,
    )


@dataclasses.dataclass
class HairModel:
    """Host-side wrapper around the padded hair arena.

    Topology operations live in hairgs_tpu/topo/graph_ops.py and are invoked
    through this wrapper; the jitted step consumes params/graph/stats directly.
    """

    sh_degree: int = 0
    spatial_lr_scale: float = 1.0
    capacity_round: int = 4096

    params: Optional[HairParams] = None
    graph: Optional[HairGraph] = None
    stats: Optional[GaussianStats] = None
    opt_state: Optional[AdamState] = None
    num_endpoints: int = 0
    num_segments: int = 0
    active_sh_degree: int = 0
    pval: float = 0.05
    dist_to_scale_factor: float = pval_to_dist_to_scale_factor(0.05)
    training_args: Optional[object] = None
    ref_strand_root: Optional[np.ndarray] = None  # (R,3) scalp vertices
    strand_root_endpoint_idx: Optional[np.ndarray] = None  # (n,) int
    strands_info: Optional[object] = None
    max_segment_length: float = 0.0
    merge_dist_th: float = 2e-3
    merge_angle_th: float = 20.0

    @property
    def max_sh_degree(self) -> int:
        return self.sh_degree

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

    # -- arena management ------------------------------------------------

    def install(self, endpoints: np.ndarray, endpoint_pairs: np.ndarray,
                seg_arrays: dict, moments: Optional[dict] = None, step: int = 0,
                moment_maps=None, carry_param_values: bool = False):
        """Write host arrays into (re)padded device arenas.

        seg_arrays: features_dc / features_rest / opacity / mask / width.
        moments (optional): {"mu": {...}, "nu": {...}} including "endpoints".
        moment_maps (optional): (ep_src, seg_src, zero_planes) gather-or-zero
        index maps into the CURRENT opt_state rows (-1 = zero-init) — the
        Adam carry is then computed on device, avoiding the ~1 MB/s
        device->host pull of the moment arenas (CLAUDE.md).
        carry_param_values: surviving rows (src >= 0) take their CURRENT
        device parameter values instead of the host arrays (async topology:
        the host mirror is a stale snapshot for survivors, authoritative only
        for new rows). Requires moment_maps and a surgery that never
        value-mutates surviving rows (cat/prune/re-link only).
        """
        ne = endpoints.shape[0]
        ns = endpoint_pairs.shape[0]
        cap_e = _round_capacity(ne, self.capacity_round)
        cap_s = _round_capacity(ns, self.capacity_round)

        host_params = HairParams(
            endpoints=_pad_to(endpoints.astype(np.float32), cap_e),
            features_dc=_pad_to(seg_arrays["features_dc"].astype(np.float32), cap_s),
            features_rest=_pad_to(seg_arrays["features_rest"].astype(np.float32), cap_s),
            opacity=_pad_to(seg_arrays["opacity"].astype(np.float32), cap_s),
            mask=_pad_to(seg_arrays["mask"].astype(np.float32), cap_s),
            width=_pad_to(seg_arrays["width"].astype(np.float32), cap_s),
        )

        remapped = None
        carried = None
        if moment_maps is not None and self.opt_state is not None:
            ep_src, seg_src, zero_planes = moment_maps

            def dev_map(src, cap):
                # capacity-shaped maps: eager ops compile per SHAPE through
                # the remote helper, so count-dependent shapes would
                # recompile every topology event (minutes each); padding the
                # map to the arena capacity keeps shapes bucket-stable
                src_cap = np.full(cap, -1, np.int64)
                src_cap[: src.shape[0]] = src
                idx = jnp.asarray(np.clip(src_cap, 0, None).astype(np.int32))
                live = jnp.asarray(src_cap >= 0)

                def take(name, arr, fallback=None):
                    if fallback is None and name in zero_planes:
                        return jnp.zeros((cap,) + arr.shape[1:], arr.dtype)
                    g = arr[idx]
                    lv = live.reshape((-1,) + (1,) * (g.ndim - 1))
                    return jnp.where(lv, g, 0 if fallback is None
                                     else jnp.asarray(fallback))

                return take

            take_e = dev_map(ep_src, cap_e)
            take_s = dev_map(seg_src, cap_s)

            def remap_tree(tree, fallbacks=None):
                def pick(name, arr):
                    fb = getattr(fallbacks, name) if fallbacks is not None else None
                    return (take_e if name == "endpoints" else take_s)(name, arr, fb)

                return HairParams(**{
                    name: pick(name, getattr(tree, name))
                    for name in HairParams._fields
                })

            remapped = AdamState(
                mu=remap_tree(self.opt_state.mu),
                nu=remap_tree(self.opt_state.nu),
                step=jnp.asarray(step, jnp.int32),
            )
            if carry_param_values and self.params is not None:
                assert not zero_planes, (
                    "carry_param_values cannot express host-mutated planes")
                carried = remap_tree(self.params, fallbacks=host_params)
        if carried is not None:
            self.params = carried
        else:
            assert not carry_param_values, (
                "carry_param_values requires moment_maps and live opt_state")
            self.params = HairParams(
                **{name: jnp.asarray(getattr(host_params, name))
                   for name in HairParams._fields}
            )
        pairs = _pad_to(endpoint_pairs.astype(np.int32), cap_s)
        self.graph = HairGraph(
            endpoint_pairs=jnp.asarray(pairs),
            seg_active=jnp.arange(cap_s) < ns,
            ep_active=jnp.arange(cap_e) < ne,
        )
        self.num_endpoints = ne
        self.num_segments = ns
        self.stats = GaussianStats(
            max_radii2d=jnp.zeros((cap_s,), jnp.float32),
            xyz_grad_accum=jnp.zeros((cap_s, 1), jnp.float32),
            denom=jnp.zeros((cap_s, 1), jnp.float32),
        )
        if remapped is not None:
            self.opt_state = remapped
        elif moments is None:
            self.opt_state = adam_init(self.params)
        else:
            def mk(kind):
                m = moments[kind]
                return HairParams(
                    endpoints=jnp.asarray(_pad_to(m["endpoints"], cap_e)),
                    features_dc=jnp.asarray(_pad_to(m["features_dc"], cap_s)),
                    features_rest=jnp.asarray(_pad_to(m["features_rest"], cap_s)),
                    opacity=jnp.asarray(_pad_to(m["opacity"], cap_s)),
                    mask=jnp.asarray(_pad_to(m["mask"], cap_s)),
                    width=jnp.asarray(_pad_to(m["width"], cap_s)),
                )

            self.opt_state = AdamState(mu=mk("mu"), nu=mk("nu"),
                                       step=jnp.asarray(step, jnp.int32))

    def host_arrays(self, keys=None):
        """Pull (a subset of) the arenas to host. Device->host runs at
        ~1 MB/s through the remote TPU tunnel, so callers that only need a
        few planes should pass `keys` (e.g. strand walking needs
        endpoints/pairs/opacity/mask, not features)."""
        e, s = self.num_endpoints, self.num_segments
        p = self.params
        sources = dict(
            endpoints=(p.endpoints, e),
            endpoint_pairs=(self.graph.endpoint_pairs, s),
            features_dc=(p.features_dc, s),
            features_rest=(p.features_rest, s),
            opacity=(p.opacity, s),
            mask=(p.mask, s),
            width=(p.width, s),
        )
        if keys is None:
            keys = sources.keys()
        # slice ON DEVICE before pulling (granule-bucketed; one batched
        # transfer): the arenas are capacity-padded and the device->host
        # link is the ~1 MB/s bottleneck of every topology event
        from hairgs_tpu.core.hostsync import sliced_pull

        return sliced_pull({k: sources[k] for k in keys})

    def host_moments(self):
        from hairgs_tpu.core.hostsync import sliced_pull

        e, s = self.num_endpoints, self.num_segments

        def sources(tree, prefix):
            return {f"{prefix}/{k}": (v, e if k == "endpoints" else s)
                    for k, v in tree._asdict().items()}

        pulled = sliced_pull({**sources(self.opt_state.mu, "mu"),
                              **sources(self.opt_state.nu, "nu")})
        out = {"mu": {}, "nu": {}}
        for key, v in pulled.items():
            g, k = key.split("/", 1)
            out[g][k] = v
        return out

    def np_opacity(self, arrays):
        return 1.0 / (1.0 + np.exp(-arrays["opacity"]))

    def np_mask(self, arrays):
        return 1.0 / (1.0 + np.exp(-arrays["mask"]))

    def np_scaling(self, arrays):
        """Derived per-segment scaling, numpy mirror of hair_derived."""
        pairs = arrays["endpoints"][arrays["endpoint_pairs"]]
        norm = np.linalg.norm(pairs[:, 1] - pairs[:, 0], axis=-1, keepdims=True)
        scale_x = np.clip(norm / 2.0 * self.dist_to_scale_factor, MIN_VAL, None)
        scale_yz = np.exp(np.repeat(arrays["width"], 2, axis=1))
        return np.concatenate([scale_x, scale_yz], axis=1)

    def compute_foreground_mask_np(self, arrays=None):
        if arrays is None:
            arrays = self.host_arrays()
        return (self.np_opacity(arrays)[:, 0] >= OPACITY_TH) & (
            self.np_mask(arrays)[:, 0] >= FG_BIN_TH
        )

    # -- checkpoint I/O --------------------------------------------------

    def save_checkpoint(self, path: str):
        """Full optimization state incl. Adam moments + graph + strand roots
        (npz) — goes beyond the reference's PLY checkpoints, which restart
        optimizer moments on resume (SURVEY §5.4)."""
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        arrays = self.host_arrays()
        mom = self.host_moments()
        state = {f"param/{k}": v for k, v in arrays.items() if k != "endpoint_pairs"}
        state["endpoint_pairs"] = arrays["endpoint_pairs"]
        state.update({f"mu/{k}": v for k, v in mom["mu"].items()})
        state.update({f"nu/{k}": v for k, v in mom["nu"].items()})
        state["step"] = np.asarray(int(self.opt_state.step))
        state["active_sh_degree"] = np.asarray(self.active_sh_degree)
        state["spatial_lr_scale"] = np.asarray(self.spatial_lr_scale)
        state["strand_root_endpoint_idx"] = (
            self.strand_root_endpoint_idx
            if self.strand_root_endpoint_idx is not None
            else np.zeros(0, np.int64)
        )
        state["ref_strand_root"] = (
            self.ref_strand_root if self.ref_strand_root is not None
            else np.zeros((0, 3), np.float32)
        )
        np.savez(path, **state)

    def load_checkpoint(self, path: str):
        from hairgs_tpu.topo.strands import compute_strands_info

        state = dict(np.load(path))
        endpoints = state["param/endpoints"]
        pairs = state["endpoint_pairs"]
        seg = {
            k.split("/", 1)[1]: v for k, v in state.items()
            if k.startswith("param/") and k != "param/endpoints"
        }
        mom = {
            "mu": {k.split("/", 1)[1]: v for k, v in state.items() if k.startswith("mu/")},
            "nu": {k.split("/", 1)[1]: v for k, v in state.items() if k.startswith("nu/")},
        }
        self.install(endpoints, pairs, seg, moments=mom, step=int(state["step"]))
        self.active_sh_degree = int(state["active_sh_degree"])
        self.spatial_lr_scale = float(state["spatial_lr_scale"])
        self.strand_root_endpoint_idx = state["strand_root_endpoint_idx"]
        self.ref_strand_root = state["ref_strand_root"]
        if self.ref_strand_root.shape[0]:
            compute_strands_info(self)

    def save_ply(self, path: str):
        from hairgs_tpu.io.ply import save_hair_ply

        arrays = self.host_arrays()
        root_idx = (
            self.strand_root_endpoint_idx
            if self.strand_root_endpoint_idx is not None
            else np.zeros(0, dtype=np.int64)
        )
        ref = self.ref_strand_root if self.ref_strand_root is not None else np.zeros((0, 3))
        save_hair_ply(path, arrays, np.asarray(root_idx), np.asarray(ref))

    def load_ply(self, path: str):
        from hairgs_tpu.io.ply import load_hair_ply
        from hairgs_tpu.topo.strands import compute_strands_info

        arrays, root_idx, ref_root = load_hair_ply(path, self.max_sh_degree)
        endpoints = arrays.pop("endpoints")
        pairs = arrays.pop("endpoint_pairs")
        self.install(endpoints, pairs, arrays)
        self.active_sh_degree = self.max_sh_degree
        self.strand_root_endpoint_idx = root_idx
        self.ref_strand_root = ref_root
        compute_strands_info(self)

    def training_setup(self, training_args):
        """hair_gaussian_model.py:212-283 — schedules + max segment length
        from the foreground bounding box."""
        self.training_args = training_args
        self.set_pval(training_args.pval)
        self.merge_dist_th = training_args.merge_dist_th_init
        self.merge_angle_th = training_args.merge_angle_th_init
        arrays = self.host_arrays()
        fg = self.compute_foreground_mask_np(arrays)
        ep_mask = np.zeros(arrays["endpoints"].shape[0], dtype=bool)
        if fg.any():
            ep_mask[arrays["endpoint_pairs"][fg].ravel()] = True
        else:
            ep_mask[:] = True
        pts = arrays["endpoints"][ep_mask]
        if pts.shape[0] > 0:
            extent = np.linalg.norm(pts.max(axis=0) - pts.min(axis=0))
            self.max_segment_length = float(extent) / training_args.num_points_strand
        if self.opt_state is None and self.params is not None:
            self.opt_state = adam_init(self.params)
