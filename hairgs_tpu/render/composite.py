"""Per-tile front-to-back alpha compositing with a custom VJP.

TPU-native replacement for renderCUDA (forward.cu:261-374) and the DISTWAR
backward (backward_distwar.cu). Instead of a sequential per-pixel loop with
atomics, each tile processes its depth-sorted Gaussian list in chunks:

- within a chunk, the latched early-termination of the CUDA kernel
  (`test_T < 1e-4 -> done`) is computed *in parallel* via the exclusive
  cumulative product of (1 - alpha): the unlatched transmittance is monotone
  non-increasing, so `T_incl >= 1e-4` reproduces the latch exactly;
- the color accumulation Sum_k w_k * f_k becomes a (pixels x chunk) @
  (chunk x channels) matmul that maps onto the MXU;
- the backward pass re-traverses chunks in reverse, reconstructing
  transmittance from per-chunk residuals and forming the suffix-sum term
  (the `accum_rec` recurrence of backward_original.cu:460-546) in closed
  form — per-Gaussian gradient accumulation is a dense reduction, no atomics.

Numerics match the CUDA kernel: alpha = min(0.99, o*exp(power)), skip if
power > 0 or alpha < 1/255, stop when T would drop below 1e-4, and the
0.99-clamp is ignored in the backward (as the CUDA code does).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99


def _tile_pixel_coords(grid_w: int, grid_h: int, tile_size: int) -> jnp.ndarray:
    """(num_tiles, tile_size^2, 2) float pixel coordinates per tile."""
    nt = grid_w * grid_h
    t = jnp.arange(nt, dtype=jnp.int32)
    ox = (t % grid_w) * tile_size
    oy = (t // grid_w) * tile_size
    p = jnp.arange(tile_size * tile_size, dtype=jnp.int32)
    px = ox[:, None] + (p % tile_size)[None, :]
    py = oy[:, None] + (p // tile_size)[None, :]
    return jnp.stack([px, py], axis=-1).astype(jnp.float32)


def _chunk_alphas(xy_c, con_c, opa_c, pix, alpha_min=ALPHA_MIN):
    """alpha/aux terms for one chunk.

    xy_c (NT,CH,2), con_c (NT,CH,3), opa_c (NT,CH), pix (NT,P,2)
    returns alpha (NT,CH,P) with cutoffs applied, plus G, ok, dx, dy.
    """
    dx = xy_c[:, :, 0:1] - pix[:, None, :, 0]  # (NT,CH,P)
    dy = xy_c[:, :, 1:2] - pix[:, None, :, 1]
    a = con_c[:, :, 0:1]
    b = con_c[:, :, 1:2]
    c = con_c[:, :, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opa_c[:, :, None] * G)
    ok = (power <= 0.0) & (alpha >= alpha_min)
    alpha = jnp.where(ok, alpha, 0.0)
    return alpha, G, ok, dx, dy


def _split_chunks(x, num_chunks, chunk):
    nt = x.shape[0]
    return x.reshape(nt, num_chunks, chunk, *x.shape[2:]).swapaxes(0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def composite(xy_g, con_g, opa_g, feat_g, grid_w, grid_h, tile_size, chunk,
              alpha_min=ALPHA_MIN):
    """Front-to-back composite of per-tile depth-sorted Gaussian lists.

    Args (all gathered per tile slot, invalid slots must carry opacity 0):
        xy_g:   (NT, K, 2) pixel-space means
        con_g:  (NT, K, 3) conics
        opa_g:  (NT, K)    opacities
        feat_g: (NT, K, C) feature channels
    Returns:
        out:   (NT, P, C) composited features WITHOUT background
        trans: (NT, P) final transmittance
    """
    out, trans, _ = _forward(xy_g, con_g, opa_g, feat_g, grid_w, grid_h,
                             tile_size, chunk, alpha_min)
    return out, trans


def _forward(xy_g, con_g, opa_g, feat_g, grid_w, grid_h, tile_size, chunk,
             alpha_min=ALPHA_MIN):
    nt, K = opa_g.shape
    C = feat_g.shape[-1]
    P = tile_size * tile_size
    assert K % chunk == 0, f"pair capacity {K} must be divisible by chunk {chunk}"
    num_chunks = K // chunk
    pix = _tile_pixel_coords(grid_w, grid_h, tile_size)

    xs = (
        _split_chunks(xy_g, num_chunks, chunk),
        _split_chunks(con_g, num_chunks, chunk),
        _split_chunks(opa_g, num_chunks, chunk),
        _split_chunks(feat_g, num_chunks, chunk),
    )

    def step(carry, x):
        trans, out = carry
        xy_c, con_c, opa_c, feat_c = x
        alpha, _, _, _, _ = _chunk_alphas(xy_c, con_c, opa_c, pix, alpha_min)
        l = jnp.log1p(-alpha)
        cum = jnp.cumsum(l, axis=1)
        t_incl = trans[:, None, :] * jnp.exp(cum)  # unlatched; monotone in k
        live = t_incl >= T_EPS
        t_excl = trans[:, None, :] * jnp.exp(cum - l)
        w = jnp.where(live, alpha * t_excl, 0.0)  # (NT,CH,P)
        out = out + jnp.einsum("tkp,tkc->tpc", w, feat_c, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        trans_next = trans * jnp.exp(jnp.sum(jnp.where(live, l, 0.0), axis=1))
        return (trans_next, out), trans  # emit chunk-start transmittance

    init = (
        jnp.ones((nt, P), dtype=jnp.float32),
        jnp.zeros((nt, P, C), dtype=jnp.float32),
    )
    (trans, out), trans_starts = jax.lax.scan(step, init, xs)
    return out, trans, trans_starts


def _composite_fwd(xy_g, con_g, opa_g, feat_g, grid_w, grid_h, tile_size,
                   chunk, alpha_min=ALPHA_MIN):
    out, trans, trans_starts = _forward(
        xy_g, con_g, opa_g, feat_g, grid_w, grid_h, tile_size, chunk, alpha_min
    )
    return (out, trans), (xy_g, con_g, opa_g, feat_g, trans, trans_starts)


def _composite_bwd(grid_w, grid_h, tile_size, chunk, alpha_min, res, cts):
    xy_g, con_g, opa_g, feat_g, trans_final, trans_starts = res
    g_out, g_trans = cts
    nt, K = opa_g.shape
    num_chunks = K // chunk
    pix = _tile_pixel_coords(grid_w, grid_h, tile_size)

    xs = (
        _split_chunks(xy_g, num_chunks, chunk),
        _split_chunks(con_g, num_chunks, chunk),
        _split_chunks(opa_g, num_chunks, chunk),
        _split_chunks(feat_g, num_chunks, chunk),
        trans_starts,  # already (num_chunks, NT, P)
    )

    def step(b_carry, x):
        xy_c, con_c, opa_c, feat_c, trans_in = x
        alpha, G, ok, dx, dy = _chunk_alphas(xy_c, con_c, opa_c, pix,
                                             alpha_min)
        l = jnp.log1p(-alpha)
        cum = jnp.cumsum(l, axis=1)
        t_incl = trans_in[:, None, :] * jnp.exp(cum)
        live = t_incl >= T_EPS
        t_excl = trans_in[:, None, :] * jnp.exp(cum - l)
        w = jnp.where(live, alpha * t_excl, 0.0)

        # f_k . g  per (tile, slot, pixel)
        fdotg = jnp.einsum("tkc,tpc->tkp", feat_c, g_out, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        wf = w * fdotg
        csum = jnp.cumsum(wf, axis=1)
        total = csum[:, -1, :]  # (NT,P)
        suffix = total[:, None, :] - csum  # exclusive suffix sum over k
        B = suffix + b_carry[:, None, :]

        use = live & ok
        dalpha = jnp.where(use, t_excl * fdotg - B / (1.0 - alpha), 0.0)

        d_opa = jnp.sum(jnp.where(use, G * dalpha, 0.0), axis=2)  # dL/d opacity
        dpower = jnp.where(use, opa_c[:, :, None] * G * dalpha, 0.0)
        d_a = jnp.sum(dpower * (-0.5 * dx * dx), axis=2)
        d_b = jnp.sum(dpower * (-dx * dy), axis=2)
        d_c = jnp.sum(dpower * (-0.5 * dy * dy), axis=2)
        a = con_c[:, :, 0:1]
        b = con_c[:, :, 1:2]
        c = con_c[:, :, 2:3]
        d_x = jnp.sum(dpower * (-(a * dx + b * dy)), axis=2)
        d_y = jnp.sum(dpower * (-(c * dy + b * dx)), axis=2)
        d_feat = jnp.einsum("tkp,tpc->tkc", w, g_out, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

        b_carry_next = b_carry + total
        grads = (
            jnp.stack([d_x, d_y], axis=-1),
            jnp.stack([d_a, d_b, d_c], axis=-1),
            d_opa,
            d_feat,
        )
        return b_carry_next, grads

    b_init = trans_final * g_trans  # dL/dT_final enters the suffix term
    _, grads = jax.lax.scan(step, b_init, xs, reverse=True)

    def unsplit(a):  # (num_chunks, NT, CH, ...) -> (NT, K, ...)
        return a.swapaxes(0, 1).reshape(nt, K, *a.shape[3:])

    return tuple(unsplit(g) for g in grads)


composite.defvjp(_composite_fwd, _composite_bwd)


def assemble_image(tiles: jnp.ndarray, grid_w: int, grid_h: int, tile_size: int,
                   height: int, width: int) -> jnp.ndarray:
    """(NT, P, ...) tile-major pixels -> (H, W, ...) image (cropped)."""
    trailing = tiles.shape[2:]
    img = tiles.reshape(grid_h, grid_w, tile_size, tile_size, *trailing)
    img = jnp.swapaxes(img, 1, 2)
    img = img.reshape(grid_h * tile_size, grid_w * tile_size, *trailing)
    return img[:height, :width]


def composite_naive(xy, conic, opacity, features, depth, valid, width: int, height: int,
                    bg=None, rect=None, tile_size: int = 16,
                    alpha_min: float = ALPHA_MIN) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential reference compositor (exact CUDA loop semantics, O(N*H*W)).

    Test oracle only — mirrors forward.cu:261-374 literally: global stable
    depth sort, per-pixel done latch, same cutoffs. If `rect` (N,4 tile-unit
    bounds) is given, a Gaussian only touches pixels whose tile lies in its
    rect — the CUDA kernel has this same behavior via binning, so parity
    tests must apply it. Returns (image (H,W,C), final transmittance (H,W)).
    """
    n = opacity.shape[0]
    order = jnp.argsort(jax.lax.stop_gradient(depth), stable=True)
    xy = xy[order]
    conic = conic[order]
    opacity = jnp.where(valid[order], opacity[order], 0.0)
    features = features[order]
    if rect is None:
        rect = jnp.zeros((n, 4), dtype=jnp.int32)
        rect = rect.at[:, 2:].set(2**30)
    else:
        rect = rect[order]

    ys, xs_ = jnp.mgrid[0:height, 0:width]
    pxf = xs_.astype(jnp.float32)
    pyf = ys.astype(jnp.float32)
    ptx = (xs_ // tile_size).astype(jnp.int32)
    pty = (ys // tile_size).astype(jnp.int32)

    def step(carry, g):
        trans, out, done = carry
        xy_g, con_g, opa_g, feat_g, rect_g = g
        dx = xy_g[0] - pxf
        dy = xy_g[1] - pyf
        power = -0.5 * (con_g[0] * dx * dx + con_g[2] * dy * dy) - con_g[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opa_g * jnp.exp(power))
        in_rect = (
            (ptx >= rect_g[0]) & (ptx < rect_g[2]) & (pty >= rect_g[1]) & (pty < rect_g[3])
        )
        ok = (power <= 0.0) & (alpha >= alpha_min) & (~done) & in_rect
        test_t = trans * (1.0 - alpha)
        saturate = ok & (test_t < T_EPS)
        done = done | saturate
        use = ok & (~saturate)
        out = out + jnp.where(use[..., None], (alpha * trans)[..., None] * feat_g, 0.0)
        trans = jnp.where(use, test_t, trans)
        return (trans, out, done), None

    c = features.shape[-1]
    init = (
        jnp.ones((height, width), dtype=jnp.float32),
        jnp.zeros((height, width, c), dtype=jnp.float32),
        jnp.zeros((height, width), dtype=bool),
    )
    (trans, out, _), _ = jax.lax.scan(step, init, (xy, conic, opacity, features, rect))
    if bg is not None:
        out = out + trans[..., None] * bg
    return out, trans
