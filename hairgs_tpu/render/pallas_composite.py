"""Pallas TPU kernels for per-tile front-to-back compositing.

This is the TPU-native counterpart of renderCUDA (forward.cu:261-374) and the
DISTWAR backward (backward_distwar.cu), replacing the pure-XLA scan compositor
(composite.py) on the hot path. Key properties:

- consumes the depth-sorted *chunk-aligned paged pair table* directly — two
  HBM planes per pair: an 8-row f32 GEOMETRY plane [x, y, conic_a, conic_b,
  conic_c, opacity, aux0, aux1] and a C-row FEATURE plane (f32 or bf16,
  RasterConfig.feat_bf16) — built with two gathers after the sort; no
  (num_tiles, K) gather/idx materialization. Splitting the planes lets the
  feature channels ride half-width DMA without costing geometry precision
  (xy needs ~1e-3 px at 1000px).
- each tile DMAs (double-buffered, both planes in flight) and processes only
  ceil(count/chunk) chunks of its own page and stops as soon as every pixel's
  transmittance saturates below 1e-4 — the same early-out the CUDA kernel
  gets from __syncthreads_count(done);
- several tiles are processed per grid step (tiles_per_step) to amortize the
  pipeline's per-step overhead over the 4k-tile grid;
- all contractions are MXU-shaped: in-chunk prefix/suffix transmittance sums
  are triangular matmuls, color accumulation is (pixels x chunk) @
  (chunk x channels). Every dot goes through _dot_hi (manual bf16 hi/lo
  split, 2-3 DEFAULT passes): the MXU DEFAULT alone (one bf16 pass,
  1.1e-3 rel measured on hardware) would put visible error into the
  log-space transmittance prefix sums; HIGHEST (bf16x6, full f32)
  measured a 7% headline regression when it landed between the round-4
  A/B (11.57 it/s) and the round-5 solo re-measure (10.74) — the "extra
  passes are free" claim was wrong; and Precision.HIGH (the natural
  middle) raises NotImplementedError in this Mosaic lowering. _dot_hi's
  ~2^-18 rel keeps the parity gate's image error at the 1e-5 scale (gate
  1e-3; the dominant term was compositing order, fixed — see
  binning._quantize_depth).

The backward writes per-pair gradients into the paged order (each tile owns
its chunk-aligned page, so writes never touch another tile's slots) and the
caller's gather-based permutation VJP routes them back to Gaussians without
any large scatter. Gradient planes: d_geo (8, P) f32 rows [d_x, d_y, d_a,
d_b, d_c, d_opa, d_x2, d_y2] (the aux rows receive the photometric-only
viewspace gradients — densification stats) and d_feat (C, P) in the feature
dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99
GEO_ROWS = 8  # x, y, a, b, c, opacity, aux0, aux1
TILES_PER_STEP = 32


def _dot_hi(a, b, dims, exact_b=False):
    """bf16x3-class MXU contraction in 2-3 DEFAULT passes.

    Mosaic implements only DEFAULT (one bf16 pass, 1.1e-3 rel measured on
    hardware — too coarse for the log-space transmittance prefix sums) and
    HIGHEST (bf16x6 full f32 — measured a 7% headline regression when it
    landed on all 8 kernel dots; Precision.HIGH raises NotImplementedError
    in the Mosaic lowering). This is the middle tier done by hand:
    hi = bf16(x), lo = x - hi; the hi*hi + hi*lo + lo*hi passes accumulate
    in f32 and bound the relative error at ~2^-18 (dropped lo*lo + the
    MXU's re-rounding of lo) — ~30x inside the parity gate's budget now
    that the dominant ordering term is fixed (binning._quantize_depth) —
    at half or a third of HIGHEST's MXU passes.

    exact_b: b is exactly bf16-representable (the 0/1 triangular masks),
    so b needs no split — two passes, each product exact."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    kw = dict(preferred_element_type=jnp.float32)
    if exact_b:
        return (jax.lax.dot_general(a_hi, b, dims, **kw)
                + jax.lax.dot_general(a_lo, b, dims, **kw))
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    return (jax.lax.dot_general(a_hi, b_hi, dims, **kw)
            + (jax.lax.dot_general(a_hi, b_lo, dims, **kw)
               + jax.lax.dot_general(a_lo, b_hi, dims, **kw)))


def pack_geo_rows(xy, conic, opacity, aux=None):
    """Per-gaussian geometry rows (N, 8) f32: [x, y, a, b, c, opacity,
    aux0, aux1].

    `aux` (N,2), when given, occupies the last two rows: the forward kernel
    never reads them, and the backward kernel writes the *photometric-only*
    viewspace gradients there — so d(aux) delivers the densification
    statistics of the reference's first-render screenspace tensor without a
    second VJP pull."""
    n = xy.shape[0]
    if aux is None:
        aux = jnp.zeros((n, 2), xy.dtype)
    return jnp.concatenate(
        [xy[:, 0:1], xy[:, 1:2], conic, opacity[:, None], aux], axis=1
    )


def pad_feat_rows(features, feat_bf16: bool):
    """Feature plane (N, C_pad): C padded up to a multiple of 8 sublanes,
    cast to bf16 when requested (precision loss only on the feature
    channels; the compositor accumulates in f32 regardless)."""
    c = features.shape[1]
    pad = (-c) % 8
    if pad:
        features = jnp.pad(features, ((0, 0), (0, pad)))
    if feat_bf16:
        features = features.astype(jnp.bfloat16)
    return features


def _chunk_quantities(geo, feat_buf, px, py, count_in_chunk_mask, num_channels,
                      alpha_min=ALPHA_MIN):
    """Shared forward math for one chunk: geo (8, CH); feat (C_pad, CH)."""
    xg = geo[0:1, :]
    yg = geo[1:2, :]
    a = geo[2:3, :]
    b = geo[3:4, :]
    c = geo[4:5, :]
    opa = geo[5:6, :]
    feat = feat_buf[0:num_channels, :].astype(jnp.float32)
    dx = xg - px  # (PIX, CH)
    dy = yg - py
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opa * G)
    ok = (power <= 0.0) & (alpha >= alpha_min) & count_in_chunk_mask
    alpha = jnp.where(ok, alpha, 0.0)
    return alpha, G, ok, dx, dy, feat, opa


def _triangular(chunk):
    ii = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    upper_incl = (ii <= jj).astype(jnp.float32)
    strict_upper = (ii > jj).astype(jnp.float32)
    return upper_incl, strict_upper


def _pixel_coords(t, grid_w, tile_size, pix):
    ox = (t % grid_w) * tile_size
    oy = (t // grid_w) * tile_size
    p = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (ox + p % tile_size).astype(jnp.float32)
    py = (oy + p // tile_size).astype(jnp.float32)
    return px, py


def _fwd_kernel(starts_ref, counts_ref, geo_hbm, feat_hbm, out_ref, trans_ref,
                tstarts_ref, geo_buf, feat_buf, accum, trans, done, sem,
                *, grid_w, tile_size, chunk, max_chunks, num_channels,
                tiles_per_step, lookahead, alpha_min=ALPHA_MIN):
    pix = tile_size * tile_size
    upper_incl, _ = _triangular(chunk)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    # K-deep prefetch window into per-chunk slots: per-chunk transfers are
    # only a few KB, so the serialized start->wait->start chain of a classic
    # 2-slot double buffer was latency-bound; a deeper window keeps copies
    # in flight while PRESERVING the early-exit gating (a saturating tile
    # stops issuing, bounding its HBM reads to the saturation chunk + K
    # instead of the whole page). done[bank, 1] counts issued DMAs so every
    # one is awaited.
    window = min(4, max_chunks)
    nbanks = 2 if lookahead else 1

    def geo_dma(bank, start, j):
        offset = pl.multiple_of(start + j * chunk, chunk)
        return pltpu.make_async_copy(
            geo_hbm.at[:, pl.ds(offset, chunk)], geo_buf.at[bank, j],
            sem.at[bank, j, 0],
        )

    def feat_dma(bank, start, j):
        offset = pl.multiple_of(start + j * chunk, chunk)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(offset, chunk)], feat_buf.at[bank, j],
            sem.at[bank, j, 1],
        )

    def issue_first_window(bank, t):
        """Issue tile t's first prefetch window into `bank`; returns the
        issued count for done[bank, 1]."""
        start = starts_ref[t]
        first = jnp.minimum(pl.cdiv(counts_ref[t], chunk), window)

        def issue(j, _):
            geo_dma(bank, start, j).start()
            feat_dma(bank, start, j).start()
            return 0

        jax.lax.fori_loop(0, first, issue, 0)
        return first

    for t_local in range(tiles_per_step):
        bank = t_local % nbanks
        t = pl.program_id(0) * tiles_per_step + t_local
        start = starts_ref[t]
        count = counts_ref[t]
        px, py = _pixel_coords(t, grid_w, tile_size, pix)

        if not lookahead or t_local == 0:
            done[bank, 1] = issue_first_window(bank, t)
        # cross-tile lookahead: the next tile's first window goes out on the
        # alternate bank BEFORE this tile's compute, hiding the DMA-latency
        # bubble that otherwise opens at every tile switch (tiles average
        # only 1-2 chunks at bench scale, so the bubble dominated).
        if lookahead and t_local + 1 < tiles_per_step:
            done[1 - bank, 1] = issue_first_window(1 - bank, t + 1)

        accum[:] = jnp.zeros((num_channels, pix), jnp.float32)
        trans[:] = jnp.ones((pix, 1), jnp.float32)
        done[bank, 0] = 0
        nchunks = pl.cdiv(count, chunk)

        def body(j, _, nchunks=nchunks, count=count, t_local=t_local,
                 bank=bank, start=start):
            # record chunk-start transmittance for the backward pass (always,
            # so post-early-exit chunks see the saturated value and go dead)
            tstarts_ref[t_local * max_chunks + j, :] = trans[:, 0]

            @pl.when(j < done[bank, 1])
            def _():
                geo_dma(bank, start, j).wait()
                feat_dma(bank, start, j).wait()

            @pl.when((j + window < nchunks) & (done[bank, 0] == 0))
            def _():
                geo_dma(bank, start, j + window).start()
                feat_dma(bank, start, j + window).start()
                done[bank, 1] = j + window + 1

            @pl.when((done[bank, 0] == 0) & (j < done[bank, 1]))
            def _():
                kmask = (j * chunk + k_iota) < count
                alpha, _, _, _, _, feat, _ = _chunk_quantities(
                    geo_buf.at[bank, j], feat_buf.at[bank, j], px, py, kmask,
                    num_channels, alpha_min,
                )
                l = jnp.log1p(-alpha)
                # inclusive prefix over the chunk
                cum = _dot_hi(l, upper_incl, (((1,), (0,)), ((), ())),
                              exact_b=True)
                t_incl = trans[:] * jnp.exp(cum)
                live = t_incl >= T_EPS
                # exp(cum - l) == exp(cum)/(1-alpha); alpha <= 0.99 so
                # the divide is safe and cheaper than a second exp
                t_excl = t_incl / (1.0 - alpha)
                w = jnp.where(live, alpha * t_excl, 0.0)
                # (C, CH) x (PIX, CH) contracting CH -> (C, PIX): keeps
                # the accumulator lane dim = pixels (no 128-lane padding)
                accum[:] += _dot_hi(feat, w, (((1,), (1,)), ((), ())))
                new_trans = trans[:] * jnp.exp(
                    jnp.sum(jnp.where(live, l, 0.0), axis=1, keepdims=True)
                )
                trans[:] = new_trans
                done[bank, 0] = jnp.where(jnp.max(new_trans) < T_EPS, 1, 0)

            return 0

        # dynamic bound: a 1-chunk tile runs 1 iteration, not max_chunks
        # guard-only iterations (most tiles have far fewer chunks than the
        # static capacity)
        jax.lax.fori_loop(0, nchunks, body, 0)
        out_ref[:, pl.ds(t_local * pix, pix)] = accum[:]
        trans_ref[t_local, :] = trans[:, 0]


def _bwd_kernel(starts_ref, counts_ref, geo_hbm, feat_hbm, tstarts_ref,
                tfinal_ref, gout_ref, gphoto_ref, gtrans_ref, dgeo_init_hbm,
                dfeat_init_hbm, dgeo_hbm, dfeat_hbm, geo_buf, feat_buf,
                dgeo_buf, dfeat_buf, bcarry, bcarry2, sem, osem, *, grid_w,
                tile_size, chunk, max_chunks, num_channels, tiles_per_step,
                with_stats, lookahead, alpha_min=ALPHA_MIN):
    del dgeo_init_hbm, dfeat_init_hbm  # aliased zero-initialized outputs
    pix = tile_size * tile_size
    upper_incl, strict_upper = _triangular(chunk)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    nbanks = 2 if lookahead else 1

    def geo_dma(bank, start, j):
        offset = pl.multiple_of(start + j * chunk, chunk)
        return pltpu.make_async_copy(
            geo_hbm.at[:, pl.ds(offset, chunk)], geo_buf.at[bank, j],
            sem.at[bank, j, 0],
        )

    def feat_dma(bank, start, j):
        offset = pl.multiple_of(start + j * chunk, chunk)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(offset, chunk)], feat_buf.at[bank, j],
            sem.at[bank, j, 1],
        )

    def issue_all(bank, t):
        """All of tile t's input DMAs, in DESCENDING chunk order — the
        backward consumes chunks back-to-front, so the first-needed copy
        must lead the issue chain."""
        start = starts_ref[t]
        nchunks = pl.cdiv(counts_ref[t], chunk)

        def issue(i, _):
            geo_dma(bank, start, nchunks - 1 - i).start()
            feat_dma(bank, start, nchunks - 1 - i).start()
            return 0

        jax.lax.fori_loop(0, nchunks, issue, 0)

    for t_local in range(tiles_per_step):
        bank = t_local % nbanks
        t = pl.program_id(0) * tiles_per_step + t_local
        start = starts_ref[t]
        count = counts_ref[t]
        px, py = _pixel_coords(t, grid_w, tile_size, pix)

        # B carries the suffix term Sum_{later} w*f.g plus T_final * g_T;
        # the photometric carry has no transmittance term (training composites
        # a black background, so the photometric loss never touches final_T)
        bcarry[:] = (
            tfinal_ref[t_local, :] * gtrans_ref[t_local, :]
        )[:, None]
        bcarry2[:] = jnp.zeros_like(bcarry2)
        g_out = gout_ref[:, pl.ds(t_local * pix, pix)]  # (C, PIX) total loss
        g_photo = gphoto_ref[:, pl.ds(t_local * pix, pix)]  # (C, PIX) photo only
        nchunks = pl.cdiv(count, chunk)

        def store_dma(j, start=start):
            offset = pl.multiple_of(start + j * chunk, chunk)
            return (
                pltpu.make_async_copy(
                    dgeo_buf.at[j], dgeo_hbm.at[:, pl.ds(offset, chunk)],
                    osem.at[j, 0],
                ),
                pltpu.make_async_copy(
                    dfeat_buf.at[j], dfeat_hbm.at[:, pl.ds(offset, chunk)],
                    osem.at[j, 1],
                ),
            )

        # all input DMAs in flight up front (per-chunk slots — see forward);
        # stores get their own per-chunk slots, drained at tile end. With
        # lookahead the NEXT tile's inputs go out on the alternate bank
        # before this tile's compute, hiding the tile-switch bubble.
        if not lookahead or t_local == 0:
            issue_all(bank, t)
        if lookahead and t_local + 1 < tiles_per_step:
            issue_all(1 - bank, t + 1)

        def body(i, _, nchunks=nchunks, count=count, t_local=t_local,
                 g_out=g_out, g_photo=g_photo, bank=bank, start=start):
            j = nchunks - 1 - i

            @pl.when(j >= 0)
            def _():
                geo_dma(bank, start, j).wait()
                feat_dma(bank, start, j).wait()

                kmask = (j * chunk + k_iota) < count
                alpha, G, ok, dx, dy, feat, opa = _chunk_quantities(
                    geo_buf.at[bank, j], feat_buf.at[bank, j], px, py, kmask,
                    num_channels, alpha_min,
                )
                l = jnp.log1p(-alpha)
                cum = _dot_hi(l, upper_incl, (((1,), (0,)), ((), ())),
                              exact_b=True)
                trans_in = tstarts_ref[t_local * max_chunks + j, :][:, None]
                t_incl = trans_in * jnp.exp(cum)
                live = t_incl >= T_EPS
                # see forward: one exp + divide instead of two exps
                t_excl = t_incl / (1.0 - alpha)
                w = jnp.where(live, alpha * t_excl, 0.0)

                # f_k . g per (pixel, slot): contract C -> (PIX, CH)
                fdotg = _dot_hi(g_out, feat, (((0,), (0,)), ((), ())))
                wf = w * fdotg
                suffix = _dot_hi(wf, strict_upper, (((1,), (0,)), ((), ())),
                                 exact_b=True)
                B = suffix + bcarry[:]
                use = live & ok
                dalpha = jnp.where(use, t_excl * fdotg - B / (1.0 - alpha), 0.0)
                d_opa = jnp.sum(jnp.where(use, G * dalpha, 0.0), axis=0,
                                keepdims=True)
                dpower = jnp.where(use, opa * G * dalpha, 0.0)
                a = geo_buf[bank, j, 2:3, :]
                b = geo_buf[bank, j, 3:4, :]
                c = geo_buf[bank, j, 4:5, :]
                d_x = jnp.sum(dpower * (-(a * dx + b * dy)), axis=0, keepdims=True)
                d_y = jnp.sum(dpower * (-(c * dy + b * dx)), axis=0, keepdims=True)
                d_a = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
                d_b = jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True)
                d_c = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
                # dL/dfeat (C, CH): contract pixels of g_out with w
                d_feat = _dot_hi(g_out, w, (((1,), (0,)), ((), ())))
                # photometric-only viewspace gradients (densification stats,
                # reference train.py:173-177 semantics) into the aux rows —
                # the marginal cost is one extra fdotg/suffix matmul pair.
                # Statically gated off once densification stops (reference
                # stops at 0.9*iters, arguments/__init__.py:103): the stats
                # are then dead weight in the step's largest phase.
                if with_stats:
                    fdotg2 = _dot_hi(g_photo, feat, (((0,), (0,)), ((), ())))
                    wf2 = w * fdotg2
                    suffix2 = _dot_hi(
                        wf2, strict_upper, (((1,), (0,)), ((), ())),
                        exact_b=True)
                    B2 = suffix2 + bcarry2[:]
                    dalpha2 = jnp.where(
                        use, t_excl * fdotg2 - B2 / (1.0 - alpha), 0.0)
                    dpower2 = jnp.where(use, opa * G * dalpha2, 0.0)
                    d_x2 = jnp.sum(dpower2 * (-(a * dx + b * dy)), axis=0,
                                   keepdims=True)
                    d_y2 = jnp.sum(dpower2 * (-(c * dy + b * dx)), axis=0,
                                   keepdims=True)
                else:
                    d_x2 = jnp.zeros((1, chunk), jnp.float32)
                    d_y2 = jnp.zeros((1, chunk), jnp.float32)

                grad_geo = jnp.concatenate(
                    [d_x, d_y, d_a, d_b, d_c, d_opa, d_x2, d_y2], axis=0
                )
                pad = dfeat_buf.shape[1] - num_channels
                if pad:
                    d_feat = jnp.concatenate(
                        [d_feat, jnp.zeros((pad, chunk), jnp.float32)], axis=0
                    )

                # masked tail slots are the tile's own page padding: zero them
                dgeo_buf[j] = jnp.where(kmask, grad_geo, 0.0)
                dfeat_buf[j] = jnp.where(kmask, d_feat, 0.0).astype(
                    dfeat_buf.dtype
                )
                g_dma, f_dma = store_dma(j)
                g_dma.start()
                f_dma.start()
                bcarry[:] += jnp.sum(wf, axis=1, keepdims=True)
                if with_stats:
                    bcarry2[:] += jnp.sum(wf2, axis=1, keepdims=True)

            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)  # dynamic: see forward

        # drain this tile's outstanding stores before its buffers are reused
        def drain(j, _):
            g_dma, f_dma = store_dma(j)
            g_dma.wait()
            f_dma.wait()
            return 0

        jax.lax.fori_loop(0, nchunks, drain, 0)


def _pad_tiles(starts, counts, nt, tiles_per_step):
    nt_pad = ((nt + tiles_per_step - 1) // tiles_per_step) * tiles_per_step
    if nt_pad != nt:
        pad = nt_pad - nt
        starts = jnp.concatenate([starts, jnp.zeros(pad, starts.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(pad, counts.dtype)])
    return starts, counts, nt_pad


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def composite_pairs(geo_rows, feat_rows, starts, counts, grid_w, grid_h,
                    tile_size, chunk, max_chunks, num_channels, interpret,
                    tiles_per_step=TILES_PER_STEP, with_stats=True,
                    lookahead=False, alpha_min=ALPHA_MIN):
    """Tile compositing over the chunk-aligned paged pair table.

    geo_rows: (8, P_paged) f32 (pack_geo_rows layout, aux slots last);
    feat_rows: (C_pad, P_paged) f32 or bf16; starts: chunk-aligned page
    offsets; counts: true per-tile pair counts.

    Returns (out, out_photo, trans): out and out_photo carry identical values
    (NT, PIX, C). Compute *photometric* losses from out_photo and everything
    else from out — the backward then uses out's cotangent + out_photo's for
    parameter gradients and out_photo's alone for the aux-row viewspace
    gradients, reproducing the reference's stats split in ONE backward pass.
    """
    out, trans, _ = _forward_pallas(geo_rows, feat_rows, starts, counts,
                                    grid_w, grid_h, tile_size, chunk,
                                    max_chunks, num_channels, interpret,
                                    tiles_per_step, lookahead, alpha_min)
    return out, out, trans


_VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # of ~16 MB/core; headroom for spills


def _assert_vmem_budget(max_chunks, chunk, c_pad, feat_dtype, num_channels,
                        tps, pix, interpret, lookahead=False):
    """Scratch VMEM scales linearly with max_chunks (one slot per chunk, all
    DMAs issued up front); fail at trace time with the resize knobs named
    instead of letting Mosaic die on an opaque allocation error. Budgets the
    BACKWARD (the larger program: banked geo/feat input slots + output slot
    arrays + the per-tile tstarts block + two cotangent blocks)."""
    if interpret:
        return
    feat_bytes = jnp.dtype(feat_dtype).itemsize
    slot_bytes = max_chunks * chunk * (GEO_ROWS * 4 + c_pad * feat_bytes)
    nbanks = 2 if lookahead else 1
    block_bytes = (
        tps * max_chunks * pix * 4       # tstarts block
        + 3 * tps * pix * 4              # trans_final + g_trans (+fwd trans)
        + 2 * num_channels * tps * pix * 4  # g_out + g_photo blocks
    )
    total = (nbanks + 1) * slot_bytes + block_bytes
    assert total <= _VMEM_BUDGET_BYTES, (
        f"compositor VMEM estimate {total / 2**20:.1f} MiB exceeds the "
        f"{_VMEM_BUDGET_BYTES / 2**20:.0f} MiB budget: max_chunks="
        f"{max_chunks} (= max_pairs_per_tile/chunk), chunk={chunk}, "
        f"c_pad={c_pad}, tiles_per_step={tps}, lookahead={lookahead}. "
        f"Lower max_pairs_per_tile, raise chunk, or lower tiles_per_step."
    )


def _forward_pallas(geo_rows, feat_rows, starts, counts, grid_w, grid_h,
                    tile_size, chunk, max_chunks, num_channels, interpret,
                    tiles_per_step=TILES_PER_STEP, lookahead=False,
                    alpha_min=ALPHA_MIN):
    nt = grid_w * grid_h
    pix = tile_size * tile_size
    c_pad = feat_rows.shape[0]
    feat_dtype = feat_rows.dtype
    tps = tiles_per_step
    nbanks = 2 if lookahead else 1
    starts, counts, nt_pad = _pad_tiles(starts, counts, nt, tps)
    assert max_chunks % 8 == 0 or interpret, (
        "pallas path requires max_pairs_per_tile/chunk to be a multiple of 8"
    )
    assert chunk % 128 == 0 or interpret, (
        "pallas path requires chunk to be a multiple of 128 (HBM lane tiling)"
    )
    _assert_vmem_budget(max_chunks, chunk, c_pad, feat_dtype, num_channels,
                        tps, pix, interpret, lookahead)
    kernel = functools.partial(
        _fwd_kernel, grid_w=grid_w, tile_size=tile_size, chunk=chunk,
        max_chunks=max_chunks, num_channels=num_channels,
        tiles_per_step=tps, lookahead=lookahead, alpha_min=alpha_min,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt_pad // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((num_channels, tps * pix), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, pix), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps * max_chunks, pix), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            # one slot per chunk per bank (bank 1 only with lookahead)
            pltpu.VMEM((nbanks, max_chunks, GEO_ROWS, chunk), jnp.float32),
            pltpu.VMEM((nbanks, max_chunks, c_pad, chunk), feat_dtype),
            pltpu.VMEM((num_channels, pix), jnp.float32),
            pltpu.VMEM((pix, 1), jnp.float32),
            pltpu.SMEM((2, 2), jnp.int32),
            pltpu.SemaphoreType.DMA((nbanks, max_chunks, 2)),
        ],
    )
    out, trans, tstarts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_channels, nt_pad * pix), jnp.float32),
            jax.ShapeDtypeStruct((nt_pad, pix), jnp.float32),
            jax.ShapeDtypeStruct((nt_pad * max_chunks, pix), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(starts, counts, geo_rows, feat_rows)
    out = out.T.reshape(nt_pad, pix, num_channels)[:nt]
    trans_full = trans
    return out, trans_full[:nt], (tstarts, trans_full)


def _composite_fwd(geo_rows, feat_rows, starts, counts, grid_w, grid_h,
                   tile_size, chunk, max_chunks, num_channels, interpret,
                   tiles_per_step=TILES_PER_STEP, with_stats=True,
                   lookahead=False, alpha_min=ALPHA_MIN):
    out, trans, (tstarts, trans_full) = _forward_pallas(
        geo_rows, feat_rows, starts, counts, grid_w, grid_h, tile_size, chunk,
        max_chunks, num_channels, interpret, tiles_per_step, lookahead,
        alpha_min,
    )
    return (out, out, trans), (geo_rows, feat_rows, starts, counts, tstarts,
                               trans_full)


def _composite_bwd(grid_w, grid_h, tile_size, chunk, max_chunks, num_channels,
                   interpret, tiles_per_step, with_stats, lookahead, alpha_min,
                   res, cts):
    geo_rows, feat_rows, starts, counts, tstarts, trans_full = res
    g_aux, g_photo, g_trans = cts
    g_out = g_aux + g_photo  # total-loss cotangent
    nt = grid_w * grid_h
    pix = tile_size * tile_size
    c_pad = feat_rows.shape[0]
    feat_dtype = feat_rows.dtype
    tps = tiles_per_step
    nbanks = 2 if lookahead else 1

    # the forward stopped once transmittance saturated; chunks past that
    # point carry zero gradients (grad planes are zero-initialized), so clamp
    # the backward's per-tile counts to the chunks the forward actually ran:
    # chunk j ran iff its START transmittance still had a live pixel
    nt_pad0 = tstarts.shape[0] // max_chunks
    chunk_live = (
        tstarts.reshape(nt_pad0, max_chunks, pix).max(axis=2) >= T_EPS
    )[:nt]
    j_ids = jnp.arange(max_chunks, dtype=jnp.int32)[None, :]
    nchunks = (counts + chunk - 1) // chunk  # (nt,)
    live_chunks = jnp.sum(
        chunk_live & (j_ids < nchunks[:, None]), axis=1
    ).astype(jnp.int32)
    counts = jnp.minimum(counts, live_chunks * chunk)

    starts, counts, nt_pad = _pad_tiles(starts, counts, nt, tps)
    if nt_pad != nt:
        pad = nt_pad - nt
        g_out = jnp.concatenate(
            [g_out, jnp.zeros((pad, pix, num_channels), g_out.dtype)], axis=0
        )
        g_photo = jnp.concatenate(
            [g_photo, jnp.zeros((pad, pix, num_channels), g_photo.dtype)], axis=0
        )
        g_trans = jnp.concatenate(
            [g_trans, jnp.zeros((pad, pix), g_trans.dtype)], axis=0
        )
    kernel = functools.partial(
        _bwd_kernel, grid_w=grid_w, tile_size=tile_size, chunk=chunk,
        max_chunks=max_chunks, num_channels=num_channels,
        tiles_per_step=tps, with_stats=with_stats, lookahead=lookahead,
        alpha_min=alpha_min,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt_pad // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # geo rows
            pl.BlockSpec(memory_space=pltpu.HBM),  # feat rows
            pl.BlockSpec((tps * max_chunks, pix), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # tstarts
            pl.BlockSpec((tps, pix), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # trans_final
            pl.BlockSpec((num_channels, tps * pix), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # g_out (channels-first)
            pl.BlockSpec((num_channels, tps * pix), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # g_photo (channels-first)
            pl.BlockSpec((tps, pix), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # g_trans
            pl.BlockSpec(memory_space=pltpu.HBM),  # d_geo init (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # d_feat init (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            # banked per-chunk input slots (bank 1 only with lookahead);
            # output slots stay single-bank (drained at each tile's end)
            pltpu.VMEM((nbanks, max_chunks, GEO_ROWS, chunk), jnp.float32),
            pltpu.VMEM((nbanks, max_chunks, c_pad, chunk), feat_dtype),
            pltpu.VMEM((max_chunks, GEO_ROWS, chunk), jnp.float32),
            pltpu.VMEM((max_chunks, c_pad, chunk), feat_dtype),
            pltpu.VMEM((pix, 1), jnp.float32),
            pltpu.VMEM((pix, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((nbanks, max_chunks, 2)),
            pltpu.SemaphoreType.DMA((max_chunks, 2)),
        ],
    )
    dgeo_init = jnp.zeros_like(geo_rows)
    dfeat_init = jnp.zeros_like(feat_rows)
    dgeo, dfeat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(geo_rows.shape, jnp.float32),
            jax.ShapeDtypeStruct(feat_rows.shape, feat_dtype),
        ],
        input_output_aliases={9: 0, 10: 1},  # 2 scalar-prefetch + 7 tensors
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(starts, counts, geo_rows, feat_rows, tstarts,
      trans_full,
      g_out.reshape(-1, num_channels).T,
      g_photo.reshape(-1, num_channels).T,
      g_trans,
      dgeo_init, dfeat_init)
    return dgeo, dfeat, None, None


composite_pairs.defvjp(_composite_fwd, _composite_bwd)
