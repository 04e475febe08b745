"""Deterministic, atomics-free tile binning.

The reference builds per-tile gaussian lists with CUDA ``atomicAdd`` appends
(``src/gaussian.cu:101-250`` calc_tile_info_kernel{,2,3}) capped at
``MAXP = N//20`` per tile (``splatter.py:569``), gathers them into a flat
list (``gaussian.cu:337-381``), and depth-orders everything with one global
``torch.sort`` on a fused ``tile_id*(BASE+1)+depth`` float key
(``splatter.py:608-613``).  The atomic appends are racy (check-then-add,
``gaussian.cu:244-247``) and non-deterministic in order.

The TPU design replaces all of that with two sorts — fully deterministic,
race-free, and XLA-native:

1. argsort gaussians by depth (invisible → +inf);
2. expand each gaussian's tile-bbox rectangle into up to ``K`` (gaussian,
   tile) pairs scattered into a fixed-capacity pair buffer;
3. one *stable* sort of the pair buffer by tile id.  Stability preserves the
   depth order within each tile, so no fused key is needed.

The resulting per-tile segments are then padded to chunk multiples so the
pallas rasterizer can run a uniform grid over chunks (the alignment padding
plays the role of the reference's shared-memory staging loop bounds,
``gaussian.cu:876-899``).

Everything here is index bookkeeping under ``jit`` with static shapes; the
only float math is the iso-probability ellipse bbox, identical to
``calc_tile_info_kernel3`` (``gaussian.cu:197-250``):
``shift_x = sqrt(Σ2d_xx · (-2 ln thresh))`` etc.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.projection import ProjectedGaussians


class BinningSpec(NamedTuple):
    """Static configuration of the binning pass (compile-time constants)."""

    n_tile_x: int
    n_tile_y: int
    tile_len_x: float     # tile_geo_length_x (focal-normalized tile width)
    tile_len_y: float
    leftmost: float
    topmost: float
    max_tiles_per_gaussian: int   # K
    pair_capacity: int            # P_max
    chunk_size: int               # G
    method: str = "prob2"         # prob2 | prob | dist
    thresh: float = 0.05

    @property
    def n_tiles(self) -> int:
        return self.n_tile_x * self.n_tile_y

    @property
    def num_chunks(self) -> int:
        # worst case: every tile wastes one partial chunk
        return self.pair_capacity // self.chunk_size + self.n_tiles

    @property
    def num_slots(self) -> int:
        return self.num_chunks * self.chunk_size


class BinnedPairs(NamedTuple):
    """Chunk-aligned (gaussian, tile) intersection lists."""

    order: jnp.ndarray        # (N,)  depth argsort permutation of the table
    gather_idx: jnp.ndarray   # (S,)  per aligned slot: index into the
                              #       depth-ORDERED arrays (clamped; see valid)
    slot_valid: jnp.ndarray   # (S,)  bool — slot holds a real pair
    chunk_tile: jnp.ndarray   # (NC,) tile id per chunk (n_tiles = unused)
    chunk_first: jnp.ndarray  # (NC,) bool — first chunk of its tile
    chunk_last: jnp.ndarray   # (NC,) bool — last chunk of its tile
    n_pairs: jnp.ndarray      # ()    total real pairs (diagnostic)
    n_clipped: jnp.ndarray    # ()    pairs dropped by the per-gaussian K cap


def _tile_bbox(spec: BinningSpec, mean2d, cov2d, visible):
    """Per-gaussian covered tile rectangle [x0, x1) x [y0, y1).

    Mirrors gaussian.cu:217-243: the iso-probability ellipse AABB, converted
    to tile indices with truncation semantics, clamped to the grid.
    """
    a, b, c, d = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2], cov2d[:, 3]
    det = a * d - b * c
    det_ok = det > 0
    if spec.method in ("prob2", "prob"):
        log_t = -2.0 * math.log(spec.thresh)
        shift_x = jnp.sqrt(jnp.maximum(a * log_t, 0.0))
        shift_y = jnp.sqrt(jnp.maximum(d * log_t, 0.0))
    else:  # "dist": fixed radius around the center (gaussian.cu:124-128)
        r = math.sqrt(spec.thresh)
        shift_x = jnp.full_like(a, r)
        shift_y = jnp.full_like(a, r)
        det_ok = jnp.ones_like(det_ok)
    cx, cy = mean2d[:, 0], mean2d[:, 1]
    # tile index range, truncation to match the uint casts in gaussian.cu:241-242
    x0 = jnp.floor((cx - shift_x - spec.leftmost) / spec.tile_len_x)
    x1 = jnp.floor((cx + shift_x - spec.leftmost) / spec.tile_len_x) + 1.0
    y0 = jnp.floor((cy - shift_y - spec.topmost) / spec.tile_len_y)
    y1 = jnp.floor((cy + shift_y - spec.topmost) / spec.tile_len_y) + 1.0
    x0 = jnp.clip(x0, 0, spec.n_tile_x).astype(jnp.int32)
    x1 = jnp.clip(x1, 0, spec.n_tile_x).astype(jnp.int32)
    y0 = jnp.clip(y0, 0, spec.n_tile_y).astype(jnp.int32)
    y1 = jnp.clip(y1, 0, spec.n_tile_y).astype(jnp.int32)
    valid = visible & det_ok
    rw = jnp.where(valid, jnp.maximum(x1 - x0, 0), 0)
    rh = jnp.where(valid, jnp.maximum(y1 - y0, 0), 0)
    return x0, y0, rw, rh


@partial(jax.jit, static_argnames=("spec",))
def bin_gaussians(proj: ProjectedGaussians, spec: BinningSpec) -> BinnedPairs:
    """Projected gaussians → chunk-aligned per-tile depth-sorted pair lists."""
    n = proj.depth.shape[0]
    K, G, P = spec.max_tiles_per_gaussian, spec.chunk_size, spec.pair_capacity
    T = spec.n_tiles

    # ---- 1. depth order (front to back) -------------------------------
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)            # (N,)
    mean2d = proj.mean2d[order]
    cov2d = proj.cov2d[order]
    visible = proj.visible[order]

    # ---- 2. bbox → pair expansion (run-length decode, no scatters) -----
    # Each gaussian owns the pair-slot range [offsets[g], offsets[g]+count[g]);
    # the inverse map slot→gaussian is a searchsorted over the (sorted)
    # offsets with sorted queries arange(P).  This replaces the reference's
    # atomicAdd appends (gaussian.cu:241-249) — and an earlier K-step
    # masked-scatter loop that XLA:TPU executed ~30x slower.
    x0, y0, rw, rh = _tile_bbox(spec, mean2d, cov2d, visible)
    count = jnp.minimum(rw * rh, K)                              # (N,)
    n_clipped = jnp.sum(jnp.maximum(rw * rh - K, 0))
    offsets = jnp.cumsum(count) - count                          # exclusive
    n_pairs = jnp.minimum(offsets[-1] + count[-1], P)

    sids = jnp.arange(P, dtype=jnp.int32)
    g_of = jnp.searchsorted(offsets.astype(jnp.int32), sids, side="right",
                            method="sort").astype(jnp.int32) - 1
    g_of = jnp.clip(g_of, 0, n - 1)
    k_of = sids - offsets[g_of]
    valid_pair = sids < n_pairs
    rw_g = jnp.maximum(rw[g_of], 1)
    ky = k_of // rw_g
    kx = k_of - ky * rw_g
    tile = (x0[g_of] + kx) + (y0[g_of] + ky) * spec.n_tile_x
    if spec.method == "dist":
        # refine: tile-centre distance test (gaussian.cu:124-128)
        tcx = spec.leftmost + (x0[g_of] + kx + 0.5) * spec.tile_len_x
        tcy = spec.topmost + (y0[g_of] + ky + 0.5) * spec.tile_len_y
        d2 = ((mean2d[g_of, 0] - tcx) ** 2 + (mean2d[g_of, 1] - tcy) ** 2)
        valid_pair = valid_pair & (d2 < spec.thresh)
        n_pairs = jnp.sum(valid_pair)
    pair_tile = jnp.where(valid_pair, tile, T)
    pair_gauss = jnp.where(valid_pair, g_of, -1)

    # ---- 3. stable sort by tile (preserves depth order per tile) -------
    sorted_tile, sorted_gauss = jax.lax.sort(
        (pair_tile, pair_gauss), num_keys=1, is_stable=True
    )

    # ---- 4. per-tile segments + chunk alignment ------------------------
    starts = jnp.searchsorted(sorted_tile, jnp.arange(T + 1, dtype=jnp.int32))
    counts = jnp.diff(starts)                                    # (T,)
    # Empty tiles still get one (all-dead) chunk so the rasterizer writes
    # zeros into their output rows — pallas out blocks are never pre-zeroed.
    nchunk_t = jnp.maximum((counts + G - 1) // G, 1)             # (T,)
    chunk_cum = jnp.concatenate([jnp.zeros((1,), nchunk_t.dtype),
                                 jnp.cumsum(nchunk_t)])          # (T+1,)
    nc_used = chunk_cum[-1]

    NC = spec.num_chunks
    cids = jnp.arange(NC, dtype=jnp.int32)
    tile_of_chunk = jnp.clip(
        jnp.searchsorted(chunk_cum, cids, side="right") - 1, 0, T - 1
    ).astype(jnp.int32)
    chunk_used = cids < nc_used
    chunk_tile = jnp.where(chunk_used, tile_of_chunk, T)
    chunk_within = cids - chunk_cum[tile_of_chunk].astype(jnp.int32)
    chunk_first = chunk_used & (chunk_within == 0)
    chunk_last = chunk_used & (chunk_within == nchunk_t[tile_of_chunk] - 1)

    # ---- 5. aligned slot → sorted-pair gather map ----------------------
    S = spec.num_slots
    sids = jnp.arange(S, dtype=jnp.int32)
    s_chunk = sids // G
    s_off = sids - s_chunk * G
    s_tile = tile_of_chunk[s_chunk]
    src = starts[s_tile] + chunk_within[s_chunk] * G + s_off
    slot_valid = chunk_used[s_chunk] & (src < starts[s_tile] + counts[s_tile])
    src = jnp.clip(src, 0, P - 1)
    gather_idx = jnp.where(slot_valid, sorted_gauss[src], 0)
    # sorted_gauss can be -1 only for invalid pairs, which slot_valid excludes,
    # but clamp defensively so downstream gathers stay in-bounds.
    gather_idx = jnp.clip(gather_idx, 0, n - 1)

    return BinnedPairs(
        order=order,
        gather_idx=gather_idx,
        slot_valid=slot_valid,
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        chunk_last=chunk_last,
        n_pairs=n_pairs,
        n_clipped=n_clipped,
    )


def pack_pairs(binned: BinnedPairs, proj: ProjectedGaussians, opa, color):
    """Gather per-pair channel data into the (C, S) packed layout.

    Channel rows: [x, y, cov_a, cov_b, cov_c, cov_d, opa, color...] padded to
    a multiple of 8 rows.  One fused (S, C) row gather (wide rows keep the
    TPU gather engine efficient) followed by a transpose.  Differentiable:
    the VJP is a single row scatter-add — the pair→gaussian gradient
    reduction the CUDA backward implements with warp shuffles + atomics
    (``gaussian.cu:676-772``).
    """
    # (N, C) channel table in original table order, columns padded to 8k
    c = 7 + color.shape[1]
    c_pad = -c % 8
    chan = jnp.concatenate(
        [proj.mean2d, proj.cov2d, opa[:, None], color]
        + ([jnp.zeros((opa.shape[0], c_pad), opa.dtype)] if c_pad else []),
        axis=1)                                        # (N, C_pad)
    final_idx = binned.order[binned.gather_idx]        # compose both gathers
    rows = jnp.take(chan, final_idx, axis=0)           # (S, C_pad)
    # dead slots are zeroed entirely: alpha becomes 0 (opacity column) and
    # no gradient flows back through them
    rows = rows * binned.slot_valid[:, None].astype(rows.dtype)
    return rows.T                                      # (C_pad, S)
