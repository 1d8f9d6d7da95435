"""Pallas TPU kernels for per-tile front-to-back compositing.

This is the TPU-native counterpart of renderCUDA (forward.cu:261-374) and the
DISTWAR backward (backward_distwar.cu), replacing the pure-XLA scan compositor
(composite.py) on the hot path. Key properties:

- consumes the depth-sorted *chunk-aligned paged pair table* directly
  ((PACK, P) in HBM, built with one gather after the sort) — no
  (num_tiles, K) gather/idx materialization;
- each tile DMAs (double-buffered) and processes only ceil(count/chunk)
  chunks of its own page and stops as soon as every pixel's transmittance
  saturates below 1e-4 — the same early-out the CUDA kernel gets from
  __syncthreads_count(done);
- several tiles are processed per grid step (tiles_per_step) to amortize the
  pipeline's per-step overhead over the 4k-tile grid;
- all contractions are MXU-shaped: in-chunk prefix/suffix transmittance sums
  are triangular matmuls, color accumulation is (pixels x chunk) @
  (chunk x channels).

The backward writes per-pair gradients into the paged order (each tile owns
its chunk-aligned page, so writes never touch another tile's slots) and the
caller's gather-based permutation VJP routes them back to Gaussians without
any large scatter.

Packed attribute rows (PACK x P): [x, y, conic_a, conic_b, conic_c, opacity,
feat_0..feat_{C-1}, 0-pad...].
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99
PACK_BASE = 6  # x, y, a, b, c, opacity
TILES_PER_STEP = 32


def pack_rows(xy, conic, opacity, features, aux=None):
    """Per-gaussian packed attribute rows (N, PACK); PACK is 6+C(+2 aux)
    rounded up to a multiple of 8 (sublane alignment after transpose).

    `aux` (N,2), when given, occupies two rows right after the features: the
    forward kernel never reads them, and the backward kernel writes the
    *photometric-only* viewspace gradients there — so d(aux) delivers the
    densification statistics of the reference's first-render screenspace
    tensor without a second VJP pull."""
    cols = [xy[:, 0:1], xy[:, 1:2], conic, opacity[:, None], features]
    if aux is not None:
        cols.append(aux)
    packed = jnp.concatenate(cols, axis=1)
    pack = packed.shape[1]
    pad = (-pack) % 8
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    return packed


def _chunk_quantities(buf, px, py, count_in_chunk_mask, num_channels):
    # feature rows are the true channel count; aux/pad rows are never read
    """Shared forward math for one chunk: buf (PACK, CH); px/py (PIX, 1)."""
    xg = buf[0:1, :]
    yg = buf[1:2, :]
    a = buf[2:3, :]
    b = buf[3:4, :]
    c = buf[4:5, :]
    opa = buf[5:6, :]
    feat = buf[PACK_BASE : PACK_BASE + num_channels, :]
    dx = xg - px  # (PIX, CH)
    dy = yg - py
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opa * G)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & count_in_chunk_mask
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


def _fwd_kernel(starts_ref, counts_ref, rows_hbm, out_ref, trans_ref, tstarts_ref,
                buf, accum, trans, done, sem, *, grid_w, tile_size, chunk,
                max_chunks, num_channels, pack, tiles_per_step):
    pix = tile_size * tile_size
    upper_incl, _ = _triangular(chunk)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    for t_local in range(tiles_per_step):
        t = pl.program_id(0) * tiles_per_step + t_local
        start = starts_ref[t]
        count = counts_ref[t]
        px, py = _pixel_coords(t, grid_w, tile_size, pix)

        accum[:] = jnp.zeros((num_channels, pix), jnp.float32)
        trans[:] = jnp.ones((pix, 1), jnp.float32)
        done[0] = 0
        nchunks = pl.cdiv(count, chunk)

        def chunk_dma(j, slot):
            offset = pl.multiple_of(start + j * chunk, chunk)
            return pltpu.make_async_copy(
                rows_hbm.at[:, pl.ds(offset, chunk)], buf.at[slot], sem.at[slot]
            )

        # double-buffered pipeline; done[1] counts issued DMAs so every one
        # is awaited even when transmittance saturation stops compute early
        @pl.when(nchunks > 0)
        def _():
            chunk_dma(0, 0).start()
            done[1] = 1

        @pl.when(nchunks == 0)
        def _():
            done[1] = 0

        def body(j, _, chunk_dma=chunk_dma, nchunks=nchunks, count=count,
                 t_local=t_local):
            # record chunk-start transmittance for the backward pass (always,
            # so post-early-exit chunks see the saturated value and go dead)
            @pl.when(j < nchunks)
            def _():
                tstarts_ref[t_local * max_chunks + j, :] = trans[:, 0]

            @pl.when(j < done[1])
            def _():
                slot = jax.lax.rem(j, 2)
                chunk_dma(j, slot).wait()

                @pl.when((j + 1 < nchunks) & (done[0] == 0))
                def _():
                    chunk_dma(j + 1, 1 - slot).start()
                    done[1] = j + 2

                @pl.when(done[0] == 0)
                def _():
                    kmask = (j * chunk + k_iota) < count
                    alpha, _, _, _, _, feat, _ = _chunk_quantities(
                        buf.at[slot], px, py, kmask, num_channels
                    )
                    l = jnp.log1p(-alpha)
                    cum = jax.lax.dot_general(
                        l, upper_incl, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # inclusive prefix over the chunk
                    t_incl = trans[:] * jnp.exp(cum)
                    live = t_incl >= T_EPS
                    t_excl = trans[:] * jnp.exp(cum - l)
                    w = jnp.where(live, alpha * t_excl, 0.0)
                    # (C, CH) x (PIX, CH) contracting CH -> (C, PIX): keeps
                    # the accumulator lane dim = pixels (no 128-lane padding)
                    accum[:] += jax.lax.dot_general(
                        feat, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    new_trans = trans[:] * jnp.exp(
                        jnp.sum(jnp.where(live, l, 0.0), axis=1, keepdims=True)
                    )
                    trans[:] = new_trans
                    done[0] = jnp.where(jnp.max(new_trans) < T_EPS, 1, 0)

            return 0

        jax.lax.fori_loop(0, max_chunks, body, 0)
        out_ref[:, pl.ds(t_local * pix, pix)] = accum[:]
        trans_ref[t_local, :] = trans[:, 0]


def _bwd_kernel(starts_ref, counts_ref, rows_hbm, tstarts_ref, tfinal_ref,
                gout_ref, gphoto_ref, gtrans_ref, drows_init_hbm, drows_hbm,
                buf, dbuf, bcarry, bcarry2, sem, osem, *, grid_w, tile_size,
                chunk, max_chunks, num_channels, pack, tiles_per_step):
    del drows_init_hbm  # aliased zero-initialized output
    pix = tile_size * tile_size
    upper_incl, strict_upper = _triangular(chunk)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    for t_local in range(tiles_per_step):
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

        def chunk_dma(j, slot):
            offset = pl.multiple_of(start + j * chunk, chunk)
            return pltpu.make_async_copy(
                rows_hbm.at[:, pl.ds(offset, chunk)], buf.at[slot], sem.at[slot]
            )

        def store_dma(j, slot):
            offset = pl.multiple_of(start + j * chunk, chunk)
            return pltpu.make_async_copy(
                dbuf.at[slot], drows_hbm.at[:, pl.ds(offset, chunk)], osem.at[slot]
            )

        # double-buffered input prefetch (reverse order) + buffered stores
        @pl.when(nchunks > 0)
        def _():
            chunk_dma(nchunks - 1, jax.lax.rem(nchunks - 1, 2)).start()

        def body(i, _, chunk_dma=chunk_dma, store_dma=store_dma,
                 nchunks=nchunks, count=count, t_local=t_local, g_out=g_out,
                 g_photo=g_photo):
            j = nchunks - 1 - i

            @pl.when(j >= 0)
            def _():
                slot = jax.lax.rem(j, 2)
                chunk_dma(j, slot).wait()

                @pl.when(j - 1 >= 0)
                def _():
                    chunk_dma(j - 1, 1 - slot).start()

                kmask = (j * chunk + k_iota) < count
                alpha, G, ok, dx, dy, feat, opa = _chunk_quantities(
                    buf.at[slot], px, py, kmask, num_channels
                )
                l = jnp.log1p(-alpha)
                cum = jax.lax.dot_general(
                    l, upper_incl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                trans_in = tstarts_ref[t_local * max_chunks + j, :][:, None]
                t_incl = trans_in * jnp.exp(cum)
                live = t_incl >= T_EPS
                t_excl = trans_in * jnp.exp(cum - l)
                w = jnp.where(live, alpha * t_excl, 0.0)

                # f_k . g per (pixel, slot): contract C -> (PIX, CH)
                fdotg = jax.lax.dot_general(
                    g_out, feat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                wf = w * fdotg
                suffix = jax.lax.dot_general(
                    wf, strict_upper, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                B = suffix + bcarry[:]
                use = live & ok
                dalpha = jnp.where(use, t_excl * fdotg - B / (1.0 - alpha), 0.0)
                d_opa = jnp.sum(jnp.where(use, G * dalpha, 0.0), axis=0,
                                keepdims=True)
                dpower = jnp.where(use, opa * G * dalpha, 0.0)
                a = buf[slot, 2:3, :]
                b = buf[slot, 3:4, :]
                c = buf[slot, 4:5, :]
                d_x = jnp.sum(dpower * (-(a * dx + b * dy)), axis=0, keepdims=True)
                d_y = jnp.sum(dpower * (-(c * dy + b * dx)), axis=0, keepdims=True)
                d_a = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
                d_b = jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True)
                d_c = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
                # dL/dfeat (C, CH): contract pixels of g_out with w
                d_feat = jax.lax.dot_general(
                    g_out, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # photometric-only viewspace gradients (densification stats,
                # reference train.py:173-177 semantics) into the aux rows —
                # the marginal cost is one extra fdotg/suffix matmul pair
                fdotg2 = jax.lax.dot_general(
                    g_photo, feat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                wf2 = w * fdotg2
                suffix2 = jax.lax.dot_general(
                    wf2, strict_upper, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                B2 = suffix2 + bcarry2[:]
                dalpha2 = jnp.where(use, t_excl * fdotg2 - B2 / (1.0 - alpha), 0.0)
                dpower2 = jnp.where(use, opa * G * dalpha2, 0.0)
                d_x2 = jnp.sum(dpower2 * (-(a * dx + b * dy)), axis=0,
                               keepdims=True)
                d_y2 = jnp.sum(dpower2 * (-(c * dy + b * dx)), axis=0,
                               keepdims=True)

                grad_rows = jnp.concatenate(
                    [d_x, d_y, d_a, d_b, d_c, d_opa, d_feat, d_x2, d_y2], axis=0
                )
                pad = pack - grad_rows.shape[0]
                if pad:
                    grad_rows = jnp.concatenate(
                        [grad_rows, jnp.zeros((pad, chunk), jnp.float32)], axis=0
                    )

                @pl.when(i >= 2)  # reusing this store slot: wait its last store
                def _():
                    store_dma(j + 2, slot).wait()

                # masked tail slots are the tile's own page padding: zero them
                dbuf[slot] = jnp.where(kmask, grad_rows, 0.0)
                store_dma(j, slot).start()
                bcarry[:] += jnp.sum(wf, axis=1, keepdims=True)
                bcarry2[:] += jnp.sum(wf2, axis=1, keepdims=True)

            return 0

        jax.lax.fori_loop(0, max_chunks, body, 0)
        # drain this tile's outstanding stores before its buffers are reused
        @pl.when(nchunks >= 1)
        def _():
            store_dma(0, 0).wait()

        @pl.when(nchunks >= 2)
        def _():
            store_dma(1, 1).wait()


def _pad_tiles(starts, counts, nt, tiles_per_step):
    nt_pad = ((nt + tiles_per_step - 1) // tiles_per_step) * tiles_per_step
    if nt_pad != nt:
        pad = nt_pad - nt
        starts = jnp.concatenate([starts, jnp.zeros(pad, starts.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(pad, counts.dtype)])
    return starts, counts, nt_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def composite_pairs(rows, starts, counts, grid_w, grid_h, tile_size, chunk,
                    max_chunks, num_channels, interpret):
    """Tile compositing over the chunk-aligned paged pair table.

    rows: (PACK, P_paged) f32 (pack_rows layout with aux slots); starts:
    chunk-aligned page offsets; counts: true per-tile pair counts.

    Returns (out, out_photo, trans): out and out_photo carry identical values
    (NT, PIX, C). Compute *photometric* losses from out_photo and everything
    else from out — the backward then uses out's cotangent + out_photo's for
    parameter gradients and out_photo's alone for the aux-row viewspace
    gradients, reproducing the reference's stats split in ONE backward pass.
    """
    out, trans, _ = _forward_pallas(rows, starts, counts, grid_w, grid_h,
                                    tile_size, chunk, max_chunks, num_channels,
                                    interpret)
    return out, out, trans


def _forward_pallas(rows, starts, counts, grid_w, grid_h, tile_size, chunk,
                    max_chunks, num_channels, interpret):
    nt = grid_w * grid_h
    pix = tile_size * tile_size
    pack = rows.shape[0]
    tps = TILES_PER_STEP
    starts, counts, nt_pad = _pad_tiles(starts, counts, nt, tps)
    assert max_chunks % 8 == 0 or interpret, (
        "pallas path requires max_pairs_per_tile/chunk to be a multiple of 8"
    )
    assert chunk % 128 == 0 or interpret, (
        "pallas path requires chunk to be a multiple of 128 (HBM lane tiling)"
    )
    kernel = functools.partial(
        _fwd_kernel, grid_w=grid_w, tile_size=tile_size, chunk=chunk,
        max_chunks=max_chunks, num_channels=num_channels, pack=pack,
        tiles_per_step=tps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt_pad // tps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((num_channels, tps * pix), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, pix), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps * max_chunks, pix), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pack, chunk), jnp.float32),
            pltpu.VMEM((num_channels, pix), jnp.float32),
            pltpu.VMEM((pix, 1), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
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
    )(starts, counts, rows)
    out = out.T.reshape(nt_pad, pix, num_channels)[:nt]
    trans_full = trans
    return out, trans_full[:nt], (tstarts, trans_full)


def _composite_fwd(rows, starts, counts, grid_w, grid_h, tile_size, chunk,
                   max_chunks, num_channels, interpret):
    out, trans, (tstarts, trans_full) = _forward_pallas(
        rows, starts, counts, grid_w, grid_h, tile_size, chunk, max_chunks,
        num_channels, interpret,
    )
    return (out, out, trans), (rows, starts, counts, tstarts, trans_full)


def _composite_bwd(grid_w, grid_h, tile_size, chunk, max_chunks, num_channels,
                   interpret, res, cts):
    rows, starts, counts, tstarts, trans_full = res
    g_aux, g_photo, g_trans = cts
    g_out = g_aux + g_photo  # total-loss cotangent
    nt = grid_w * grid_h
    pix = tile_size * tile_size
    pack = rows.shape[0]
    tps = TILES_PER_STEP

    # the forward stopped once transmittance saturated; chunks past that
    # point carry zero gradients (drows is zero-initialized), so clamp the
    # backward's per-tile counts to the chunks the forward actually computed:
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
        max_chunks=max_chunks, num_channels=num_channels, pack=pack,
        tiles_per_step=tps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt_pad // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # rows
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
            pl.BlockSpec(memory_space=pltpu.HBM),  # drows init (aliased)
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((2, pack, chunk), jnp.float32),
            pltpu.VMEM((2, pack, chunk), jnp.float32),
            pltpu.VMEM((pix, 1), jnp.float32),
            pltpu.VMEM((pix, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    drows_init = jnp.zeros_like(rows)
    (drows,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(rows.shape, jnp.float32)],
        input_output_aliases={8: 0},  # 2 scalar-prefetch + 6 tensor inputs
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(starts, counts, rows, tstarts,
      trans_full,
      g_out.reshape(-1, num_channels).T,
      g_photo.reshape(-1, num_channels).T,
      g_trans,
      drows_init)
    return drows, None, None


composite_pairs.defvjp(_composite_fwd, _composite_bwd)
