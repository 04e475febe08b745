"""Tiled alpha-compositing rasterizer: chunked jnp path + Pallas TPU kernels.

This is the TPU re-design of the reference's hottest code, the forward /
backward rasterizers (``src/gaussian.cu:807-970`` draw_kernel and
``:441-803`` draw_backward_kernel).  The CUDA version assigns one 16x16
thread block per tile, stages gaussian chunks into shared memory, and walks
gaussians sequentially per pixel; gradients are reduced with warp shuffles +
shared-memory atomics.

The TPU formulation vectorizes over (gaussian, pixel) planes instead:

- the image is processed as a 1-D grid over *chunks* of ``G`` gaussians,
  chunk-aligned per tile by :mod:`gsplat_tpu.ops.binning`;
- within a chunk the (G, Px) alpha plane puts gaussians on the sublane axis
  and the tile's pixels on the lane axis.  This orientation makes every data
  movement free: per-gaussian channels are column slices of the (G, C)
  packed block, per-pixel quantities are (1, Px) rows matching the output
  layout, and gradient reductions land directly in (G, 1) columns of the
  gradient block — no transposes, no atomics;
- the sequential front-to-back transmittance recurrence becomes an
  *exclusive cumulative product* of (1 - alpha) along the sublane axis — a
  log-depth Hillis-Steele scan of multiplies;
- the backward pass re-derives per-gaussian weights from the saved forward
  output using the same suffix-color identity as the CUDA kernel
  (``gaussian.cu:709-722``), with cross-chunk transmittance/color carried in
  VMEM scratch that persists across grid steps.

Two interchangeable implementations share one contract:
- :func:`composite_chunks_jnp` — lax.scan over chunks, differentiable via
  JAX autodiff (fallback + oracle for the kernels);
- :func:`composite_chunks_pallas` — pallas forward + custom_vjp backward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STOP_THRESH = 1e-4   # early-termination transmittance (gaussian.cu:906)
DET_EPS = 1e-14      # gaussian.cu:920
ALPHA_EPS = 1e-7     # backward 1/(1-alpha) guard (gaussian.cu:721)

# Per-chunk metadata rides the scalar-prefetch SMEM as ONE s32 per chunk
# (tile id, first/last flags, valid length share a word).  Four separate
# s32[NC] arrays overflow the 1 MiB SMEM at NC=65536 (4 x 256 KiB); packed,
# the same grid costs 256 KiB and the ceiling moves to NC=262144.
_META_CLEN_BITS = 11                     # valid len <= 2047 (chunk_size cap)
_META_CLEN_MASK = (1 << _META_CLEN_BITS) - 1
_META_FIRST = 1 << _META_CLEN_BITS       # first chunk of its tile
_META_LAST = 1 << (_META_CLEN_BITS + 1)  # last chunk of its tile
_META_TILE_SHIFT = _META_CLEN_BITS + 2   # tile id in bits 13..30 (<= 262143)


def _pack_chunk_meta(spec: "RasterSpec", chunk_tile, chunk_first, chunk_last,
                     chunk_len):
    """Pack (tile, first, last, len) into one s32 per chunk for SMEM."""
    # ValueError (not assert): these static bounds guard against silent
    # bit-field corruption and must survive `python -O`.
    if spec.chunk_size > _META_CLEN_MASK:
        raise ValueError(
            f"chunk_size {spec.chunk_size} exceeds the {_META_CLEN_MASK} "
            f"packed-meta cap")
    if spec.n_tiles + 1 > (1 << (31 - _META_TILE_SHIFT)):
        raise ValueError(
            f"tile grid {spec.n_tiles} exceeds the packed-meta tile-id range")
    return (
        (chunk_tile.astype(jnp.int32) << _META_TILE_SHIFT)
        | jnp.where(chunk_first, _META_FIRST, 0)
        | jnp.where(chunk_last, _META_LAST, 0)
        | chunk_len.astype(jnp.int32)
    )


class RasterSpec(NamedTuple):
    """Static rasterizer geometry (compile-time constants)."""

    n_tile_x: int
    n_tile_y: int
    tile_h: int
    tile_w: int
    focal_x: float
    focal_y: float
    chunk_size: int          # G
    color_dim: int           # 3 (rgb) or 27 (SH deg-2)
    weight_normalize: bool = False
    # packed-buffer layout: False = row-major (S, 8)/(S, c8) (legacy
    # pack_pairs), True = channel-major (8, S)/(c8, S) (pack_sorted fast
    # path — axis-0 stacking of the sort outputs is ~47 ms cheaper at
    # Garden scale; the kernels transpose the (8, G) block in VMEM)
    channel_major: bool = False
    # RENDER-ONLY: buffers are (4, S)/(c8/2, S) i32 with two bf16 channels
    # per element (ops/binning pack_sorted packed_bf16 preset); positions
    # are tile-relative and the kernel composites against tile-relative
    # pixel coordinates.  No backward.
    packed_bf16: bool = False
    # Color buffer arrives ROW-major (S, c8) even though geometry is
    # channel-major — set when the pack side used BinningSpec.gather_colors
    # (the post-sort row gather naturally emits row-major; a pair-scale
    # (S, c8) transpose would cost tens of ms, while the kernels' in-VMEM
    # (G, c8) transpose is ~free)
    color_row_major: bool = False
    # Geometry buffer arrives ROW-major (S, 8) — set when the pack side used
    # BinningSpec.gather_geom (the post-sort row gather emits row-major; the
    # kernels consume (G, 8) rows natively, so this merely skips the in-VMEM
    # transpose the channel-major layout needs)
    geom_row_major: bool = False
    # SH color contractions at one-pass bf16 MXU precision instead of
    # HIGHEST (3-6 passes).  Set when the pack side bf16-rounds the
    # coefficients anyway (bf16_pack): the extra passes only refine bits
    # the inputs no longer carry.  Logit error ~0.3%, inside the
    # bf16_pack error budget.
    sh_fast_matmul: bool = False
    # Sub-tile early termination: split the pixel (lane) axis into this
    # many independently-gated halves in the forward kernel.  The CUDA
    # kernel breaks per pixel (gaussian.cu:906); chunk-level gating is
    # all-256-pixels-or-nothing, so a tile whose left half saturates keeps
    # paying full-plane compute for it.  2 = two 128-lane halves, each
    # skipped once its own start-of-chunk transmittance max drops below
    # STOP_THRESH.  Output identical to ulp level (skipped work is all-masked).
    px_split: int = 1
    # RENDER-ONLY companion of BinningSpec.post_align: the packed buffers
    # arrive in SORTED order (no alignment-pad rows materialized) and the
    # forward kernel realigns each chunk itself — two 128-lane windows of
    # the sorted payload are loaded per chunk via scalar-prefetch-dependent
    # index maps (meta.chunk_src >> 7 and +1) and combined with a dynamic
    # roll + lane select.  Requires chunk_size == 128 and packed_bf16.
    # No backward (the route never builds one — see BinningSpec.post_align).
    post_align: bool = False

    @property
    def px(self) -> int:
        return self.tile_h * self.tile_w

    @property
    def n_tiles(self) -> int:
        return self.n_tile_x * self.n_tile_y

    @property
    def padded_w(self) -> int:
        return self.n_tile_x * self.tile_w

    @property
    def padded_h(self) -> int:
        return self.n_tile_y * self.tile_h

    @property
    def c_col(self) -> int:
        """Color-group columns, padded to a multiple of 8."""
        return self.color_dim + (-self.color_dim % 8)


# ---------------------------------------------------------------------------
# shared geometry helpers — (1, Px) row orientation
# ---------------------------------------------------------------------------

def _tile_pixel_ids(spec: RasterSpec, tile):
    """Padded-image pixel ids for a (traced) tile index → (1, Px) each."""
    tx = tile % spec.n_tile_x
    ty = tile // spec.n_tile_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, spec.px), 1)
    row = p // spec.tile_w
    col = p - row * spec.tile_w
    id_x = tx * spec.tile_w + col
    id_y = ty * spec.tile_h + row
    return id_x, id_y


def _tile_pixel_coords(spec: RasterSpec, tile):
    """Focal-normalized pixel centres (gaussian.cu:839-840) → (1, Px) f32.

    In packed_bf16 mode the coordinates are TILE-RELATIVE (the packed
    gaussian positions are stored relative to their tile centre, so the
    compositing differences dx, dy come out identical while both operands
    stay small enough for bf16)."""
    id_x, id_y = _tile_pixel_ids(spec, tile)
    pxc = (id_x.astype(jnp.float32) + 0.5 - spec.padded_w / 2) / spec.focal_x
    pyc = (id_y.astype(jnp.float32) + 0.5 - spec.padded_h / 2) / spec.focal_y
    if spec.packed_bf16:
        tx = tile % spec.n_tile_x
        ty = tile // spec.n_tile_x
        tcx = ((tx * spec.tile_w + spec.tile_w / 2 - spec.padded_w / 2)
               / spec.focal_x)
        tcy = ((ty * spec.tile_h + spec.tile_h / 2 - spec.padded_h / 2)
               / spec.focal_y)
        pxc = pxc - tcx.astype(jnp.float32)
        pyc = pyc - tcy.astype(jnp.float32)
    return pxc, pyc


def _sh_pixel_basis(spec: RasterSpec, tile, shv):
    """Per-pixel SH basis (9, Px) from RayInfo vectors (gaussian.cu:845-861).

    ``shv`` is scalar-indexable as shv[row, col] with rows
    [rays_o, lefttop, dx, dy] — either a (4, 3) array or an SMEM ref.
    """
    from gsplat_tpu.ops.sh import C0, C1, C2

    id_x, id_y = _tile_pixel_ids(spec, tile)
    fx = id_x.astype(jnp.float32)
    fy = id_y.astype(jnp.float32)
    comps = []
    for k in range(3):
        comps.append(shv[1, k] + fx * shv[2, k] + fy * shv[3, k] - shv[0, k])
    n = jnp.sqrt(comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2)
    inv = 1.0 / (n + 1e-7)                                        # cu:858
    x, y, z = comps[0] * inv, comps[1] * inv, comps[2] * inv      # (1, Px)
    xx, yy, zz = x * x, y * y, z * z
    basis = [
        jnp.full_like(x, C0),
        -C1 * y,
        C1 * z,
        -C1 * x,
        C2[0] * x * y,
        C2[1] * y * z,
        C2[2] * (2.0 * zz - xx - yy),
        C2[3] * x * z,
        C2[4] * (xx - yy),
    ]
    return jnp.concatenate(basis, axis=0)                         # (9, Px)


def _chunk_alpha(spec: RasterSpec, pxc, pyc, g):
    """(G, Px) alpha plane from a packed geometry (G, 8) chunk.

    Returns (alpha, prob, aux) where aux carries the per-chunk columns
    needed by the backward pass.
    """
    gx, gy = g[:, 0:1], g[:, 1:2]                   # (G, 1)
    a, b, c, d = g[:, 2:3], g[:, 3:4], g[:, 4:5], g[:, 5:6]
    opa = g[:, 6:7]
    dx = pxc - gx                                   # (G, Px)
    dy = pyc - gy
    det = a * d - b * c
    pn = 2.0 * det + DET_EPS
    pm = -(d * dx * dx - (b + c) * dx * dy + a * dy * dy)
    prob = jnp.exp(pm / pn)
    # PSD covariances give prob<=1 so alpha<1; the clamp only guards
    # degenerate numerics (it keeps transmittance monotone, which the
    # unconditional chunk carry relies on — the CUDA loop gets the same
    # safety from its per-pixel break)
    alpha = jnp.minimum(prob * opa, 0.9999)
    return alpha, prob, (dx, dy, a, b, c, d, opa, pm, pn)


def _cumprod_excl_sublanes(x):
    """Exclusive cumulative product along the sublane (first) axis.

    Hillis-Steele doubling scan — log2(G) shift-multiplies; sublane shifts
    are cheap on the VPU.
    """
    g_dim, px_dim = x.shape
    cp = x
    shift = 1
    while shift < g_dim:
        shifted = jnp.concatenate(
            [jnp.ones((shift, px_dim), x.dtype), cp[:-shift, :]], axis=0
        )
        cp = cp * shifted
        shift *= 2
    # cp is now the inclusive cumprod; shift once more for exclusive
    return jnp.concatenate([jnp.ones((1, px_dim), x.dtype), cp[:-1, :]],
                           axis=0)


def _cumsum_incl_sublanes(x):
    """Inclusive cumulative sum along the sublane axis (same doubling scan)."""
    g_dim, px_dim = x.shape
    cs = x
    shift = 1
    while shift < g_dim:
        shifted = jnp.concatenate(
            [jnp.zeros((shift, px_dim), x.dtype), cs[:-shift, :]], axis=0
        )
        cs = cs + shifted
        shift *= 2
    return cs


def _unpack_packed(spec: RasterSpec, geom, colarr):
    """packed_bf16 blocks (4, R)/(rows, R) i32 → (R, 8) geom + (R, c) colors.

    RGB rides blue in the geometry block's free lo slot (binning packs
    (x|c, y|d, a|opa, b|blue) + one (r|g) color row); SH colors come as
    coefficient pairs padded to c_col.
    """
    from gsplat_tpu.ops.binning import unpack2_bf16

    g = unpack2_bf16(geom).T                 # (R, 8): [...opa, blue-or-0]
    if spec.color_dim == 3:
        rg = unpack2_bf16(colarr).T          # (R, 2): [r, g]
        gc = jnp.concatenate([rg, g[:, 7:8]], axis=1)
    else:
        gc = unpack2_bf16(colarr).T[:, :spec.c_col]
    return g, gc


def _realign2(a, b, rot):
    """Combine two consecutive 128-lane windows into the chunk's block.

    ``a``/``b`` are the (rows, 128) windows at lane offsets 128*q and
    128*(q+1) of the sorted payload; the chunk's rows start at lane ``rot``
    of ``a``: out[:, j] = a[:, rot+j] for j < 128-rot else b[:, rot+j-128].
    One dynamic roll per window + a lane select — the unaligned-copy
    shuffle, on the VPU, fused into the consuming kernel."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, a.shape[1]), 1)
    sel = lane < (a.shape[1] - rot)
    return jnp.where(sel, pltpu.roll(a, a.shape[1] - rot, 1),
                     pltpu.roll(b, b.shape[1] - rot, 1))


def _chunk_colors(spec: RasterSpec, gc, shb):
    """Per-gaussian colors from the (G, c_col) color chunk: 3 arrays of
    (G, 1) or (G, Px)."""
    if spec.color_dim == 3:
        return [gc[:, ch:ch + 1] for ch in range(3)]
    cols = []
    for ch in range(3):
        coeff = gc[:, 9 * ch:9 * (ch + 1)]          # (G, 9)
        logits = jax.lax.dot_general(
            coeff, shb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if spec.sh_fast_matmul
                       else jax.lax.Precision.HIGHEST),
        )                                           # (G, Px)
        cols.append(jax.nn.sigmoid(logits))
    return cols


# ---------------------------------------------------------------------------
# chunked jnp implementation (differentiable fallback / kernel oracle)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("spec",))
def composite_chunks_jnp(packed, chunk_tile, chunk_first, chunk_len,
                         spec: RasterSpec, sh_vecs=None):
    """Chunk-sequential compositing with lax.scan.

    Args:
      packed: tuple (geom (S, 8), colors (S, c_col)) pair data (S = NC*G).
      chunk_tile: (NC,) tile id per chunk.
      chunk_first: (NC,) bool.
      chunk_len: (NC,) valid pairs per chunk (dead slots are masked here —
        the packed arrays are NOT pre-masked).
      sh_vecs: (4, 3) [rays_o, lefttop, dx, dy] when color_dim == 27.

    Returns (tiles_color (T+1, 3, Px), tiles_accw (T+1, Px)); row T is the
    dead-chunk sentinel.
    """
    nc = chunk_tile.shape[0]
    geom, colarr = packed
    if spec.packed_bf16:
        geom, colarr = _unpack_packed(spec, geom, colarr)
    elif spec.channel_major:
        if not spec.geom_row_major:
            geom = geom.T
        if not spec.color_row_major:
            colarr = colarr.T
    g_all = geom.reshape(nc, spec.chunk_size, 8)
    c_all = colarr.reshape(nc, spec.chunk_size, colarr.shape[-1])

    gidx = jax.lax.broadcasted_iota(jnp.int32, (spec.chunk_size, 1), 0)

    def body(carry, inp):
        accum = carry                               # (1, Px)
        (g, gc), tile, first, ln = inp
        accum = jnp.where(first, jnp.ones_like(accum), accum)
        active = tile < spec.n_tiles
        safe_tile = jnp.minimum(tile, spec.n_tiles - 1)
        pxc, pyc = _tile_pixel_coords(spec, safe_tile)
        alpha, _, _ = _chunk_alpha(spec, pxc, pyc, g)
        alpha = jnp.where(gidx < ln, alpha, 0.0)
        one_m = 1.0 - alpha
        trans = _cumprod_excl_sublanes(one_m) * accum
        live = (trans >= STOP_THRESH) & active
        w = jnp.where(live, alpha * trans, 0.0)     # (G, Px)
        shb = _sh_pixel_basis(spec, safe_tile, sh_vecs) \
            if spec.color_dim != 3 else None
        cols = _chunk_colors(spec, gc, shb)
        color = jnp.concatenate(
            [jnp.sum(w * c, axis=0, keepdims=True) for c in cols], axis=0
        )                                           # (3, Px)
        accw = jnp.sum(w, axis=0, keepdims=True)    # (1, Px)
        # transmittance is monotone non-increasing, so carrying the full
        # product is exactly equivalent to the CUDA per-pixel break
        # (gaussian.cu:906): once below STOP_THRESH it stays below and the
        # live mask keeps masking.  (A conditional "freeze" here would let
        # pixels resurrect at chunk boundaries.)
        new_accum = trans[-1:, :] * one_m[-1:, :]
        return new_accum, (color, accw)

    init = jnp.ones((1, spec.px), jnp.float32)
    _, (colors, accws) = jax.lax.scan(body, init,
                                      ((g_all, c_all), chunk_tile,
                                       chunk_first, chunk_len))
    # (NC, 3, Px) / (NC, 1, Px) → per-tile sums
    tiles_color = jax.ops.segment_sum(colors, chunk_tile, spec.n_tiles + 1)
    tiles_accw = jax.ops.segment_sum(accws[:, 0, :], chunk_tile,
                                     spec.n_tiles + 1)
    return tiles_color, tiles_accw


def assemble_image(tiles_color, tiles_accw, spec: RasterSpec):
    """(T+1, 3, Px) tile rows → (3, padded_h, padded_w) channel-major image.

    Images are CHANNEL-MAJOR (C, H, W) throughout the pipeline: a
    minor-dim-3 (H, W, 3) layout makes every downstream transpose/layout
    op pathological on TPU (8x128 tiling against a 3-wide minor axis —
    measured ~30 ms per layout shuffle at 1297x840, and the SSIM backward's
    AD transpose alone was 31 ms/step).  Host-facing surfaces (viewer
    frames, image dumps) convert with ``chw_to_hwc`` at the edge.
    """
    col = tiles_color[:spec.n_tiles]                # (T, 3, Px)
    if spec.weight_normalize:
        accw = tiles_accw[:spec.n_tiles][:, None, :]
        col = col / jnp.where(accw < 0.01, 1.0, accw)
    img = col.reshape(spec.n_tile_y, spec.n_tile_x, 3, spec.tile_h,
                      spec.tile_w)
    img = img.transpose(2, 0, 3, 1, 4)
    return img.reshape(3, spec.padded_h, spec.padded_w)


def chw_to_hwc(img):
    """Channel-major device image → (H, W, 3) (host-edge convenience)."""
    return jnp.transpose(img, (1, 2, 0))


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(spec: RasterSpec, meta_ref, shv_ref, *refs):
    if spec.post_align:
        # sorted-payload variant: two 128-lane windows per packed operand
        # (prefetch-indexed at chunk_src >> 7 and +1), realigned in-kernel
        (csrc_ref, geom_ref, geom2_ref, col_ref, col2_ref, out_ref,
         accum_ref, color_ref, accw_ref, shb_ref) = refs
    else:
        (geom_ref, col_ref, out_ref,
         accum_ref, color_ref, accw_ref, shb_ref) = refs
    i = pl.program_id(0)
    meta = meta_ref[i]
    t = meta >> _META_TILE_SHIFT
    first = (meta & _META_FIRST) != 0
    last = (meta & _META_LAST) != 0
    clen = meta & _META_CLEN_MASK
    active = t < spec.n_tiles

    @pl.when(first)
    def _():
        accum_ref[:] = jnp.ones_like(accum_ref)
        color_ref[:] = jnp.zeros_like(color_ref)
        accw_ref[:] = jnp.zeros_like(accw_ref)
        if spec.color_dim != 3:
            # per-tile SH pixel basis computed ONCE per tile (chunks of the
            # same tile reuse the scratch; ~15 plane-ops per chunk saved)
            shb_ref[:] = _sh_pixel_basis(spec, t, shv_ref)

    # chunk-level early termination: when every pixel of the tile is below
    # the stop threshold, later chunks contribute nothing (the CUDA
    # per-pixel break at chunk granularity, gaussian.cu:906)
    @pl.when(active & (jnp.max(accum_ref[:]) >= STOP_THRESH))
    def _():
        pxc_full, pyc_full = _tile_pixel_coords(spec, t)
        if spec.post_align:
            rot = csrc_ref[i] & 127
            g, gc = _unpack_packed(
                spec, _realign2(geom_ref[:], geom2_ref[:], rot),
                _realign2(col_ref[:], col2_ref[:], rot))
        elif spec.packed_bf16:
            g, gc = _unpack_packed(spec, geom_ref[:], col_ref[:])
        else:
            g = geom_ref[:].T if (spec.channel_major
                                  and not spec.geom_row_major) else geom_ref[:]
            gc = col_ref[:].T if (spec.channel_major
                                  and not spec.color_row_major) else col_ref[:]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (spec.chunk_size, 1), 0)

        def half_body(h0, hw):
            pxc = pxc_full[:, h0:h0 + hw]
            pyc = pyc_full[:, h0:h0 + hw]
            alpha, _, _ = _chunk_alpha(spec, pxc, pyc, g)
            alpha = jnp.where(gidx < clen, alpha, 0.0)
            one_m = 1.0 - alpha
            trans = _cumprod_excl_sublanes(one_m) * accum_ref[0:1, h0:h0 + hw]
            live = trans >= STOP_THRESH
            w = jnp.where(live, alpha * trans, 0.0)
            shb = shb_ref[:, h0:h0 + hw] if spec.color_dim != 3 else None
            cols = _chunk_colors(spec, gc, shb)
            for ch in range(3):
                color_ref[ch:ch + 1, h0:h0 + hw] += jnp.sum(
                    w * cols[ch], axis=0, keepdims=True)
            accw_ref[0:1, h0:h0 + hw] += jnp.sum(w, axis=0, keepdims=True)
            # monotone transmittance: unconditional carry == CUDA early stop
            accum_ref[0:1, h0:h0 + hw] = trans[-1:, :] * one_m[-1:, :]

        nsplit = max(int(spec.px_split), 1)
        assert spec.px % nsplit == 0, \
            (f"px_split={nsplit} must divide the tile pixel count "
             f"{spec.px} (remainder lanes would silently never composite)")
        if nsplit == 1:
            half_body(0, spec.px)
        else:
            # sub-tile early stop: each lane-half is gated on ITS OWN
            # saturation, so a half that finished compositing stops paying
            # plane compute while the other half keeps going.  Output is
            # identical to ulp level (skipped halves contribute all-masked work).
            hw = spec.px // nsplit
            for s in range(nsplit):
                @pl.when(jnp.max(accum_ref[0:1, s * hw:(s + 1) * hw])
                         >= STOP_THRESH)
                def _(h0=s * hw):
                    half_body(h0, hw)

    @pl.when(last)
    def _():
        # rows 0-2: composited color; row 3: accumulated weight (Σw).
        # weight normalization happens OUTSIDE the kernel in assemble_image
        # (differentiable jnp), so the backward only needs the raw sums.
        col = color_ref[:]                          # (8, Px)
        accw = accw_ref[:]
        out_ref[0] = jnp.concatenate(
            [col[:3, :], accw, col[4:, :]], axis=0)


def _bwd_kernel(spec: RasterSpec,
                meta_ref, shv_ref,
                geom_ref, col_ref, out_img_ref, grad_img_ref,
                grad_geom_ref, grad_col_ref,
                accum_ref, ccarry_ref, shb_ref):
    i = pl.program_id(0)
    meta = meta_ref[i]
    t = meta >> _META_TILE_SHIFT
    first = (meta & _META_FIRST) != 0
    clen = meta & _META_CLEN_MASK
    active = t < spec.n_tiles
    g_dim = spec.chunk_size

    @pl.when(first)
    def _():
        accum_ref[:] = jnp.ones_like(accum_ref)
        ccarry_ref[:] = jnp.zeros_like(ccarry_ref)
        if spec.color_dim != 3:
            shb_ref[:] = _sh_pixel_basis(spec, t, shv_ref)

    do_compute = active & (jnp.max(accum_ref[:]) >= STOP_THRESH)

    @pl.when(jnp.logical_not(do_compute))
    def _():
        grad_geom_ref[:] = jnp.zeros(grad_geom_ref.shape, jnp.float32)
        grad_col_ref[:] = jnp.zeros(grad_col_ref.shape, jnp.float32)

    @pl.when(do_compute)
    def _():
        pxc_full, pyc_full = _tile_pixel_coords(spec, t)
        g_in = geom_ref[:].T if (spec.channel_major
                                 and not spec.geom_row_major) else geom_ref[:]
        gc_in = col_ref[:].T if (spec.channel_major
                                 and not spec.color_row_major) else col_ref[:]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (spec.chunk_size, 1), 0)
        slot_ok = gidx < clen
        nsplit = max(int(spec.px_split), 1)
        assert spec.px % nsplit == 0, \
            (f"px_split={nsplit} must divide the tile pixel "
             f"count {spec.px}")

        def half_body(h0, hw, accumulate):
            alpha, prob, aux = _chunk_alpha(
                spec, pxc_full[:, h0:h0 + hw], pyc_full[:, h0:h0 + hw], g_in)
            dx, dy, a, b, c, d, opa, pm, pn = aux
            alpha = jnp.where(slot_ok, alpha, 0.0)
            one_m = 1.0 - alpha
            trans = _cumprod_excl_sublanes(one_m) \
                * accum_ref[0:1, h0:h0 + hw]
            live = trans >= STOP_THRESH
            w = jnp.where(live, alpha * trans, 0.0)
            shb = shb_ref[:, h0:h0 + hw] if spec.color_dim != 3 else None
            cols = _chunk_colors(spec, gc_in, shb)

            # suffix-color identity for d_alpha (gaussian.cu:709-722):
            # d_alpha = Σ_c g_c·color_g,c·T_g − Σ_c g_c·(out_c−C_incl,c)/(1−α)
            # Contracting with the pixel gradient FIRST collapses the three
            # per-channel cumulative sums into one scan:
            #   Σ_c g_c·C_incl,c = Σ_c g_c·carry_c + cumsum(w·Σ_c g_c·color_c)
            gc_dot = jnp.zeros((g_dim, hw), jnp.float32)
            gdotout = jnp.zeros((1, hw), jnp.float32)
            carry_gdot = jnp.zeros((1, hw), jnp.float32)
            chunk_color_rows = []
            for ch in range(3):
                gout_c = grad_img_ref[0, ch:ch + 1, h0:h0 + hw]  # (1, hw)
                gc_dot += gout_c * cols[ch]
                gdotout += gout_c * out_img_ref[0, ch:ch + 1, h0:h0 + hw]
                carry_gdot += gout_c * ccarry_ref[ch:ch + 1, h0:h0 + hw]
                chunk_color_rows.append(jnp.sum(w * cols[ch], axis=0,
                                                keepdims=True))
            # accw = Σ_g w_g is a 4th composited channel with color ≡ 1
            # (output row 3); its cotangent — nonzero on the
            # weight_normalize path — rides the same suffix-color identity
            gout_w = grad_img_ref[0, 3:4, h0:h0 + hw]
            gc_dot += gout_w
            gdotout += gout_w * out_img_ref[0, 3:4, h0:h0 + hw]
            carry_gdot += gout_w * ccarry_ref[3:4, h0:h0 + hw]
            chunk_color_rows.append(jnp.sum(w, axis=0, keepdims=True))
            c_incl_dot = carry_gdot + _cumsum_incl_sublanes(w * gc_dot)
            d_alpha = gc_dot * trans \
                - (gdotout - c_incl_dot) / (one_m + ALPHA_EPS)
            d_alpha = jnp.where(live & slot_ok, d_alpha, 0.0)
            # no gradient through the degenerate-numerics alpha clamp
            d_alpha = jnp.where(prob * opa < 0.9999, d_alpha, 0.0)

            d_opa = jnp.sum(d_alpha * prob, axis=1, keepdims=True)  # (G, 1)
            d_prob = d_alpha * opa

            # 2D-gaussian analytic gradients (gaussian.cu:610-634)
            inv_pn2 = 1.0 / (pn * pn)
            dp_da = prob * ((-dy * dy) * pn - (2.0 * d) * pm) * inv_pn2
            dp_db = prob * ((dx * dy) * pn - (-2.0 * c) * pm) * inv_pn2
            dp_dc = prob * ((dx * dy) * pn - (-2.0 * b) * pm) * inv_pn2
            dp_dd = prob * ((-dx * dx) * pn - (2.0 * a) * pm) * inv_pn2
            dp_dx = prob / pn * (2.0 * d * dx - (b + c) * dy)
            dp_dy = prob / pn * (2.0 * a * dy - (b + c) * dx)

            zero_col = jnp.zeros((g_dim, 1), jnp.float32)
            gg_out = jnp.concatenate([
                jnp.sum(d_prob * dp_dx, axis=1, keepdims=True),
                jnp.sum(d_prob * dp_dy, axis=1, keepdims=True),
                jnp.sum(d_prob * dp_da, axis=1, keepdims=True),
                jnp.sum(d_prob * dp_db, axis=1, keepdims=True),
                jnp.sum(d_prob * dp_dc, axis=1, keepdims=True),
                jnp.sum(d_prob * dp_dd, axis=1, keepdims=True),
                d_opa,
                zero_col,
            ], axis=1)
            col_out = []
            if spec.color_dim == 3:
                for ch in range(3):
                    col_out.append(jnp.sum(
                        grad_img_ref[0, ch:ch + 1, h0:h0 + hw] * w,
                        axis=1, keepdims=True))
            else:
                for ch in range(3):
                    # d logits = g_c · w · σ(1−σ); d coeff = d logits @ SHᵀ
                    dlog = grad_img_ref[0, ch:ch + 1, h0:h0 + hw] * w \
                        * cols[ch] * (1.0 - cols[ch])   # (G, hw)
                    dcoef = jax.lax.dot_general(
                        dlog, shb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.DEFAULT
                                   if spec.sh_fast_matmul
                                   else jax.lax.Precision.HIGHEST),
                    )                                   # (G, 9)
                    col_out.append(dcoef)
            gcol = jnp.concatenate(col_out, axis=1)
            pad = spec.c_col - gcol.shape[1]
            if pad:
                gcol = jnp.concatenate(
                    [gcol, jnp.zeros((g_dim, pad), jnp.float32)], axis=1)
            gg_w = gg_out.T if (spec.channel_major
                                and not spec.geom_row_major) else gg_out
            gc_w = gcol.T if (spec.channel_major
                              and not spec.color_row_major) else gcol
            if accumulate:
                grad_geom_ref[:] += gg_w
                grad_col_ref[:] += gc_w
            else:
                grad_geom_ref[:] = gg_w
                grad_col_ref[:] = gc_w

            for ch in range(4):
                ccarry_ref[ch:ch + 1, h0:h0 + hw] += chunk_color_rows[ch]
            accum_ref[0:1, h0:h0 + hw] = trans[-1:, :] * one_m[-1:, :]

        if nsplit == 1:
            half_body(0, spec.px, accumulate=False)
        else:
            # sub-tile gating (see _fwd_kernel): halves accumulate into the
            # per-gaussian gradient blocks, so zero them first
            grad_geom_ref[:] = jnp.zeros(grad_geom_ref.shape, jnp.float32)
            grad_col_ref[:] = jnp.zeros(grad_col_ref.shape, jnp.float32)
            hw = spec.px // nsplit
            for s_ in range(nsplit):
                @pl.when(jnp.max(accum_ref[0:1, s_ * hw:(s_ + 1) * hw])
                         >= STOP_THRESH)
                def _(h0=s_ * hw):
                    half_body(h0, hw, accumulate=True)


def _raster_fwd_pallas(spec: RasterSpec, packed, sh_vecs, chunk_tile,
                       chunk_first, chunk_last, chunk_len, interpret=False,
                       chunk_src=None):
    geom, colarr = packed
    nc = chunk_tile.shape[0]
    n_rows = spec.n_tiles + 1
    if spec.post_align:
        # sorted-order packed buffers: each operand is read through TWO
        # 128-lane windows whose positions come from the prefetched
        # chunk_src (>> 7 = window index; & 127 = in-window rotation,
        # applied by the kernel's _realign2)
        if spec.chunk_size != 128:
            raise ValueError("post_align requires chunk_size == 128 "
                             "(one chunk == one 128-lane window)")
        lo = lambda i, m, s, c: (0, c[i] >> 7)            # noqa: E731
        hi = lambda i, m, s, c: (0, (c[i] >> 7) + 1)      # noqa: E731
        in_specs = [
            pl.BlockSpec((geom.shape[0], 128), lo),
            pl.BlockSpec((geom.shape[0], 128), hi),
            pl.BlockSpec((colarr.shape[0], 128), lo),
            pl.BlockSpec((colarr.shape[0], 128), hi),
        ]
    elif spec.packed_bf16:
        in_specs = [
            pl.BlockSpec((geom.shape[0], spec.chunk_size),
                         lambda i, *_: (0, i)),
            pl.BlockSpec((colarr.shape[0], spec.chunk_size),
                         lambda i, *_: (0, i)),
        ]
    elif spec.channel_major:
        in_specs = [
            pl.BlockSpec((spec.chunk_size, 8), lambda i, *_: (i, 0))
            if spec.geom_row_major else
            pl.BlockSpec((8, spec.chunk_size), lambda i, *_: (0, i)),
            pl.BlockSpec((spec.chunk_size, spec.c_col),
                         lambda i, *_: (i, 0))
            if spec.color_row_major else
            pl.BlockSpec((spec.c_col, spec.chunk_size),
                         lambda i, *_: (0, i)),
        ]
    else:
        in_specs = [
            pl.BlockSpec((spec.chunk_size, 8), lambda i, *_: (i, 0)),
            pl.BlockSpec((spec.chunk_size, spec.c_col),
                         lambda i, *_: (i, 0)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if spec.post_align else 2,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 8, spec.px),
                         lambda i, m, *_: (m[i] >> _META_TILE_SHIFT, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, spec.px), jnp.float32),   # accum
            pltpu.VMEM((8, spec.px), jnp.float32),   # color rows
            pltpu.VMEM((1, spec.px), jnp.float32),   # accumulated weight
            pltpu.VMEM((9, spec.px), jnp.float32),   # per-tile SH basis
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, 8, spec.px), jnp.float32),
    ]
    meta = _pack_chunk_meta(spec, chunk_tile, chunk_first, chunk_last,
                            chunk_len)
    if spec.post_align:
        args = (meta, sh_vecs, chunk_src, geom, geom, colarr, colarr)
    else:
        args = (meta, sh_vecs, geom, colarr)
    [tiles] = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    # rows 0-2 color, row 3 accumulated weight
    return tiles, tiles[:, 3, :]


def _raster_bwd_pallas(spec: RasterSpec, packed, sh_vecs, chunk_tile,
                       chunk_first, chunk_last, chunk_len, out_tiles,
                       grad_tiles, interpret=False):
    geom, colarr = packed
    nc = chunk_tile.shape[0]
    if spec.channel_major:
        pk_specs = [
            pl.BlockSpec((spec.chunk_size, 8), lambda i, *_: (i, 0))
            if spec.geom_row_major else
            pl.BlockSpec((8, spec.chunk_size), lambda i, *_: (0, i)),
            pl.BlockSpec((spec.chunk_size, spec.c_col),
                         lambda i, *_: (i, 0))
            if spec.color_row_major else
            pl.BlockSpec((spec.c_col, spec.chunk_size),
                         lambda i, *_: (0, i)),
        ]
    else:
        pk_specs = [
            pl.BlockSpec((spec.chunk_size, 8), lambda i, *_: (i, 0)),
            pl.BlockSpec((spec.chunk_size, spec.c_col),
                         lambda i, *_: (i, 0)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=pk_specs + [
            pl.BlockSpec((1, 8, spec.px),
                         lambda i, m, *_: (m[i] >> _META_TILE_SHIFT, 0, 0)),
            pl.BlockSpec((1, 8, spec.px),
                         lambda i, m, *_: (m[i] >> _META_TILE_SHIFT, 0, 0)),
        ],
        out_specs=list(pk_specs),
        scratch_shapes=[
            pltpu.VMEM((1, spec.px), jnp.float32),   # accum carry
            pltpu.VMEM((8, spec.px), jnp.float32),   # color carry (incl.)
            pltpu.VMEM((9, spec.px), jnp.float32),   # per-tile SH basis
        ],
    )
    meta = _pack_chunk_meta(spec, chunk_tile, chunk_first, chunk_last,
                            chunk_len)
    grad_geom, grad_col = pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(geom.shape, jnp.float32),
                   jax.ShapeDtypeStruct(colarr.shape, jnp.float32)],
        interpret=interpret,
    )(meta, sh_vecs, geom, colarr, out_tiles, grad_tiles)
    return grad_geom, grad_col


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _raster_pallas(spec: RasterSpec, interpret, packed, sh_vecs, chunk_tile,
                   chunk_first, chunk_last, chunk_len, tile_ok):
    tiles, accw = _raster_fwd_pallas(spec, packed, sh_vecs, chunk_tile,
                                     chunk_first, chunk_last, chunk_len,
                                     interpret)
    # RAW outputs: the dead-chunk sentinel row (and any truncated tile's
    # rows) are never written by the kernel — the caller masks with tile_ok
    # (composite_chunks_pallas), one fused select instead of a scatter +
    # select chain per output
    return tiles[:, :3, :], accw


def _raster_pallas_fwd(spec, interpret, packed, sh_vecs, chunk_tile,
                       chunk_first, chunk_last, chunk_len, tile_ok):
    tiles, accw = _raster_fwd_pallas(spec, packed, sh_vecs, chunk_tile,
                                     chunk_first, chunk_last, chunk_len,
                                     interpret)
    res = (packed, sh_vecs, chunk_tile, chunk_first, chunk_last, chunk_len,
           tile_ok, tiles)
    return (tiles[:, :3, :], accw), res


def _raster_pallas_bwd(spec, interpret, res, grads):
    if spec.packed_bf16:
        raise NotImplementedError(
            "packed_bf16 is a render-only preset; train with "
            "packed_bf16=False (f32 buffers)")
    packed, sh_vecs, chunk_tile, chunk_first, chunk_last, chunk_len, \
        tile_ok, out_tiles = res
    g_tiles, g_accw = grads
    n_rows = spec.n_tiles + 1
    # Rows of chunk-budget-truncated (or empty) tiles are never (fully)
    # written by the forward kernel — uninitialized HBM.  Their cotangent is
    # zero, but the backward kernel computes gout * out_img, and 0 * NaN/Inf
    # from a never-written row would poison grads of gaussians shared with
    # healthy tiles.  Zero both operands for non-ok rows before the kernel.
    out_tiles = jnp.where(tile_ok[:, None, None], out_tiles, 0.0)
    # rows 0-2: color cotangent; row 3: accw cotangent (nonzero when weight
    # normalization backprops through the Σw channel); rows 4-7 unused.
    # Concatenate instead of scatters-into-zeros (cheaper relayout).
    g_full = jnp.concatenate(
        [g_tiles, g_accw[:, None, :],
         jnp.zeros((n_rows, 4, spec.px), jnp.float32)], axis=1)
    g_full = jnp.where(tile_ok[:, None, None], g_full, 0.0)
    grad_packed = _raster_bwd_pallas(
        spec, packed, sh_vecs, chunk_tile, chunk_first, chunk_last,
        chunk_len, out_tiles, g_full, interpret,
    )
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (grad_packed, jnp.zeros_like(sh_vecs), f0(chunk_tile),
            f0(chunk_first), f0(chunk_last), f0(chunk_len), f0(tile_ok))


_raster_pallas.defvjp(_raster_pallas_fwd, _raster_pallas_bwd)


def composite_chunks_pallas(packed, chunk_tile, chunk_first, chunk_last,
                            chunk_len, spec: RasterSpec, sh_vecs=None,
                            interpret=False, tile_ok=None, chunk_src=None):
    """Pallas counterpart of :func:`composite_chunks_jnp` (same contract).

    ``tile_ok`` ((T+1,) bool) marks tiles whose output rows the forward
    kernel fully writes; their outputs are masked to zero here (the kernel
    leaves truncated/empty tiles and the sentinel row unwritten), and the
    backward zeroes the same rows before its kernel.  Defaults to all tiles
    ok + sentinel row False (fits-in-budget use).
    """
    if sh_vecs is None:
        sh_vecs = jnp.zeros((4, 3), jnp.float32)
    if tile_ok is None:
        tile_ok = jnp.concatenate(
            [jnp.ones((spec.n_tiles,), jnp.bool_),
             jnp.zeros((1,), jnp.bool_)])
    chunk_first = chunk_first.astype(jnp.int32)
    chunk_last = chunk_last.astype(jnp.int32)
    if spec.post_align:
        # render-only sorted-payload route: no vjp exists (the packer
        # already rejects post_align on trainable specs), so the forward
        # is called directly — autodiff through it fails loudly
        tiles, accw = _raster_fwd_pallas(
            spec, packed, sh_vecs, chunk_tile, chunk_first, chunk_last,
            chunk_len, interpret, chunk_src=chunk_src)
        tiles_color = tiles[:, :3, :]
    else:
        tiles_color, accw = _raster_pallas(
            spec, interpret, packed, sh_vecs, chunk_tile, chunk_first,
            chunk_last, chunk_len, tile_ok)
    return (jnp.where(tile_ok[:, None, None], tiles_color, 0.0),
            jnp.where(tile_ok[:, None], accw, 0.0))


def rasterize(packed, binned, spec: RasterSpec, sh_vecs=None,
              use_pallas=True, interpret=False):
    """packed pairs + binning metadata → (padded_h, padded_w, 3) image."""
    if spec.post_align and not use_pallas:
        # jnp-compositor adapter: realign the sorted payloads at XLA level
        # (the fused in-kernel realign is a pallas-only path), then proceed
        # as the standard aligned packed_bf16 preset
        from gsplat_tpu.ops.realign import realign_slots_xla

        s = binned.chunk_tile.shape[0] * spec.chunk_size
        rows = [p[j] for p in packed for j in range(p.shape[0])]
        aligned = realign_slots_xla(tuple(rows), binned.chunk_src,
                                    binned.chunk_len, s)
        g_rows = packed[0].shape[0]
        packed = (jnp.stack(aligned[:g_rows]), jnp.stack(aligned[g_rows:]))
        spec = spec._replace(post_align=False)
    if use_pallas:
        tiles_color, tiles_accw = composite_chunks_pallas(
            packed, binned.chunk_tile, binned.chunk_first, binned.chunk_last,
            binned.chunk_len, spec, sh_vecs, interpret=interpret,
            tile_ok=binned.tile_ok, chunk_src=getattr(binned, "chunk_src",
                                                      None),
        )
    else:
        tiles_color, tiles_accw = composite_chunks_jnp(
            packed, binned.chunk_tile, binned.chunk_first, binned.chunk_len,
            spec, sh_vecs,
        )
        # truncated tiles hold PARTIAL composites on the jnp path; zero
        # them to match the fail-safe contract (the pallas path masks
        # inside composite_chunks_pallas)
        tiles_color = jnp.where(binned.tile_ok[:, None, None],
                                tiles_color, 0.0)
        tiles_accw = jnp.where(binned.tile_ok[:, None], tiles_accw, 0.0)
    return assemble_image(tiles_color, tiles_accw, spec)
