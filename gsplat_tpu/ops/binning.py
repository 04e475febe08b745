"""Deterministic, atomics-free tile binning.

The reference builds per-tile gaussian lists with CUDA ``atomicAdd`` appends
(``src/gaussian.cu:101-250`` calc_tile_info_kernel{,2,3}) capped at
``MAXP = N//20`` per tile (``splatter.py:569``), gathers them into a flat
list (``gaussian.cu:337-381``), and depth-orders everything with one global
``torch.sort`` on a fused ``tile_id*(BASE+1)+depth`` float key
(``splatter.py:608-613``).  The atomic appends are racy (check-then-add,
``gaussian.cu:244-247``) and non-deterministic in order.

The TPU design is shaped by one measured fact: on TPU, element-granularity
gathers/scatters over multi-million-entry arrays cost ~7 ns/element, while
sorts and dense broadcasts are fast.  So the pipeline is built from sorts,
broadcasts and cumsums, with exactly ONE pair-scale gather on the forward
path and ZERO scatters anywhere:

1. argsort gaussians by depth (invisible → +inf);
2. expand every gaussian into a dense (N, K) candidate-pair plane — tile
   ids computed by broadcast arithmetic from the iso-probability ellipse
   bbox (identical math to ``calc_tile_info_kernel3``,
   ``gaussian.cu:197-250``); invalid candidates get a sentinel tile;
3. one *stable* sort of the flattened plane by tile id (stability keeps the
   depth order within each tile), carrying two payloads: the original
   gaussian index (for channel packing) and the flat candidate index (for
   the backward inverse map);
4. per-tile segments from a (T+1)-query searchsorted; all chunk metadata is
   computed at (num_chunks,) scale and *broadcast* to slots — never
   gathered at slot scale;
5. the gradient route back from chunk-aligned slots to gaussians is a pure
   gather: a segment-wise cumsum builds each sorted pair's aligned slot, a
   second sort inverts the permutation, and the (N, K, C) reduction over K
   is a free reshape-sum (see ``pack_pairs``).  This replaces both the CUDA
   warp-shuffle atomics (``gaussian.cu:676-772``) and a 380 ms XLA
   scatter-add.

The chunk-aligned slot buffer (``slot_capacity``) is sized independently of
the candidate plane and retuned from observed pair counts by the trainer;
its alignment padding plays the role of the reference's shared-memory
staging loop bounds (``gaussian.cu:876-899``).
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
    max_tiles_per_gaussian: int   # K — candidate plane width
    slot_capacity: int            # chunk-aligned pair slot budget (mult of G)
    chunk_size: int               # G
    method: str = "prob2"         # prob2 | prob | dist
    thresh: float = 0.05
    # Candidate-plane row budget: only the first `visible_rows` depth-sorted
    # gaussians enter the plane (invisible ones sort to the back, so on real
    # scenes 40-60% of rows are dead).  0 = table capacity.  Overflow drops
    # the FARTHEST visible gaussians and is reported via n_vis_dropped.
    visible_rows: int = 0
    # Candidate-plane construction (pack_sorted fast path only):
    #   "dense"  — a (V, K) plane; dead candidates (coverage < K) ride the
    #              sorts as sentinel rows (avg real coverage is ~2.4 at
    #              Garden scale, so ~60% of the plane is dead weight);
    #   "colcap" — rows are coverage-sorted (descending, depth-stable), so
    #              column k's real entries form a PREFIX of length
    #              m_k = #rows with coverage > k, and each column is
    #              statically sliced to ``col_caps[k]`` ≈ m_k · margin.
    #              Pair-plane size drops from V·K to ~Σ m_k (≈ real pair
    #              count).  Depth order is preserved by sorting on the
    #              composite key (tile << rank_bits) | (depth_rank >> s)
    #              — finer depth resolution than the reference's float
    #              key (splatter.py:608-613 packs depth into the mantissa
    #              bits left over after tile_id).
    plane_mode: str = "dense"
    # static per-column row caps for "colcap" (len == max_tiles_per_gaussian,
    # retuned by the trainer from the observed column fills `col_fill`);
    # () = every column capped at V (equivalent to dense-size worst case)
    col_caps: tuple = ()
    # RENDER-ONLY preset: carry channel values as bf16 pairs bitcast into
    # i32 sort payloads — halves the payload-sort operand count (sort cost
    # is per-operand on TPU, PERF.md).  Positions are stored relative to
    # each pair's tile centre so the bf16 mantissa (8 bits) keeps sub-pixel
    # accuracy (~0.2 px at 16-px tiles); the kernels re-add the centre in
    # f32.  The backward pass is NOT supported (training keeps f32).
    packed_bf16: bool = False
    # Wide-color (SH) fast path, colcap only: colors do NOT ride the payload
    # sort.  27 extra f32 payloads make the TPU sort expander's comparator
    # generation blow up (the 36-operand SH graph never finished a 45-min
    # compile, PERF.md round-3) and would cost ~27 ms at Garden pair scale
    # anyway.  Instead the sort carries key+flat+geometry (9 operands, same
    # shape as the RGB graph) and the (S, c8) color block is produced by ONE
    # row gather through ``sorted_flat`` (~5 ns/row, 108-B rows); the
    # backward adds one iota payload and inverts with one row gather.  The
    # color block comes out ROW-major — consume with a raster spec carrying
    # ``color_row_major=True``.
    gather_colors: bool = False
    # Full gather route (requires gather_colors): geometry does not ride a
    # payload sort either — the forward runs ONE stable (key, flat) sort at
    # real-pair scale (no alignment-pad rows: slots map to sorted positions
    # analytically from the chunk metadata, since tile segments are
    # G-aligned by construction), and BOTH channel blocks are produced by
    # post-sort row gathers through the same slot→source-row map.  The
    # geometry block comes out ROW-major (S, 8) — consume with
    # ``geom_row_major=True``.  Backward: one (flat, slot) sort inverts the
    # permutation; geometry and color cotangents move with one row gather
    # each.  vs the ride-the-sort default this trades ~7 sort payloads +
    # one key-only metadata sort + T·(G−1) pad rows (~0.4·P at Garden
    # scale) for one 32-B row gather (~5 ns/row at slot scale) per
    # direction.
    gather_geom: bool = False
    # Quantized depth keys (colcap only): depth enters the composite sort
    # key as an rb-bit linear quantization instead of an exact argsort rank,
    # eliminating both depth argsorts from the pack.  rb = 18 bits at
    # Garden tile counts — finer than the reference's float key (~11
    # mantissa bits after the tile id, splatter.py:608-613).  Deterministic
    # (stable sorts break bin ties); the visible-row overflow cut degrades
    # into column-cap clipping.
    quant_depth: bool = False
    # TRAIN-CAPABLE packed payloads (colcap only): cov/opa/color channels
    # ride the payload sort as bf16 pairs bitcast into i32 operands, cutting
    # the forward sort from key+flat+10 f32 operands to key+flat+2 f32
    # (positions — kept full precision: position grads drive densification
    # and sub-pixel compositing) + 3 i32.  The backward inverse sort packs
    # its non-position COTANGENTS the same way (bf16 keeps f32's exponent;
    # ~0.4% relative mantissa noise on Adam-normalized grads).  Unlike the
    # render-only ``packed_bf16`` preset the sort keeps the ``flat``
    # backward map and the outputs are unpacked to the standard f32
    # channel-major buffers right after the sort, so the kernels and the
    # custom-vjp backward are unchanged.  Quality: the preset measured
    # 65.7 dB vs the f32 render (PERF.md round-3) — far above any training
    # target.
    bf16_pack: bool = False
    # Sub-LSB candidate cull (colcap only): drop (gaussian, tile) pairs whose
    # maximum alpha anywhere in the tile is below 1/510 — half an 8-bit LSB,
    # sub-visible by construction.  The exact convex-quadratic-over-box
    # minimum (``_q_min_box``) makes the test conservative: a pair is culled
    # ONLY if opa·exp(−q) < 1/510 over the whole tile rect (the mean's own
    # tile is always kept).  The bbox test (gaussian.cu:217-243) is
    # opacity-blind and rectangle-blind, so elongated/diagonal and
    # post-opacity-reset gaussians carry many dead pairs — and pair count is
    # THE cost driver (sorts, chunk grid, kernel time all scale with it).
    cull_sublsb: bool = False
    # Shared alignment-pad pool (colcap only, -1 = off): the payload sort's
    # static shape reserves T·(G−1) pad rows — the worst case of every tile
    # needing G−1 pads — but the pads actually used are Σ(−count_t mod G)
    # (~0.12·P at Garden scale vs the 0.45·P reservation).  With pad_rows
    # ≥ 0 the pads are generated into ONE shared pool of that static size
    # (per-tile assignment via a cumsum + searchsorted at pool scale), so
    # every payload-sort operand drops the dead reservation.  Overflow is
    # fail-safe: alignment breaks CASCADE (every tile after the first
    # short-padded one shifts), so all tiles from the break point render
    # zero via tile_ok, and ``n_pad_dropped``/``n_pad_used`` feed the
    # trainer's budget retunes like every other static budget.
    pad_rows: int = -1
    # Post-sort alignment (colcap, exclusive with gather_geom's analytic
    # map): sort ONLY the real candidate rows — no alignment-pad rows ride
    # the payload sort, and the single stable sort's keys double as the
    # metadata source, so the separate key-only sort disappears too.  Chunk
    # alignment is restored AFTER the sort by one slot-scale row gather
    # (slot s of chunk c reads sorted position starts[t]+s−G·chunk_cum[t],
    # the same analytic map the gather_geom route uses).  The win is the
    # sort's power-of-two row bucket: at the Garden preset the real pairs
    # (1.00M) fit lax.sort's 2^20 bucket while pairs+pads (1.32M) pay the
    # 2^21 one (PERF.md round-5 trace: paysort 5.65 ms of a 19.9 ms frame).
    post_align: bool = False

    @property
    def n_tiles(self) -> int:
        return self.n_tile_x * self.n_tile_y

    @property
    def num_chunks(self) -> int:
        return self.slot_capacity // self.chunk_size

    @property
    def num_slots(self) -> int:
        return self.num_chunks * self.chunk_size


class BinnedPairs(NamedTuple):
    """Chunk-aligned (gaussian, tile) intersection lists."""

    aligned_idx: jnp.ndarray  # (S,)  original gaussian index per slot
    slot_valid: jnp.ndarray   # (S,)  bool — slot holds a real pair
    chunk_tile: jnp.ndarray   # (NC,) tile id per chunk (n_tiles = unused)
    chunk_first: jnp.ndarray  # (NC,) bool — first chunk of its tile
    chunk_last: jnp.ndarray   # (NC,) bool — last chunk of its tile
    chunk_len: jnp.ndarray    # (NC,) valid pairs in this chunk (<= G)
    slot_of_pair: jnp.ndarray  # (P,)  aligned slot of each (N,K) candidate,
                               #       -1 for dead candidates (bwd route)
    inv_order: jnp.ndarray     # (N,)  depth row of each original gaussian
                               #       (inverse of the depth argsort)
    tile_ok: jnp.ndarray      # (T+1,) bool — tile fully composited within
                              #       the chunk budget (sentinel row False);
                              #       truncated tiles' outputs must be zeroed
    n_pairs: jnp.ndarray      # ()    total real pairs (diagnostic)
    n_clipped: jnp.ndarray    # ()    pairs dropped by the per-gaussian K cap
    n_dropped: jnp.ndarray    # ()    pairs dropped by slot_capacity overflow
    n_max_tiles: jnp.ndarray  # ()    max tiles covered by any gaussian
    n_visible: jnp.ndarray    # ()    frustum-visible gaussians
    n_vis_dropped: jnp.ndarray  # ()  visible gaussians beyond visible_rows
    col_fill: jnp.ndarray = None          # (K,) colcap column fills (unused)
    n_plane_clipped: jnp.ndarray = None   # () colcap cap overflow (unused)
    n_chunks_used: jnp.ndarray = None     # () chunks actually needed
                                          # (nc_used; the trainer retunes
                                          # slot_capacity from this)


def _tile_bbox(spec: BinningSpec, mean2d, cov2d, visible):
    """Per-gaussian covered tile rectangle [x0, x1) x [y0, y1).

    Mirrors gaussian.cu:217-243: the iso-probability ellipse AABB, converted
    to tile indices with truncation semantics, clamped to the grid.
    Delegates to :func:`_tile_bbox_rows` (single copy of the parity-critical
    bbox math).
    """
    return _tile_bbox_rows(
        spec, mean2d[:, 0], mean2d[:, 1], cov2d[:, 0], cov2d[:, 1],
        cov2d[:, 2], cov2d[:, 3], visible)


def _tile_bbox_rows(spec: BinningSpec, cx, cy, a, b, c, d, visible):
    """:func:`_tile_bbox` on channel-major rows ((V,) arrays) — all
    elementwise, no strided column slices.  Truncation/clamp semantics
    match the uint casts in gaussian.cu:241-242; "dist" uses a fixed
    radius around the center (gaussian.cu:124-128)."""
    det = a * d - b * c
    det_ok = det > 0
    if spec.method in ("prob2", "prob"):
        log_t = -2.0 * math.log(spec.thresh)
        shift_x = jnp.sqrt(jnp.maximum(a * log_t, 0.0))
        shift_y = jnp.sqrt(jnp.maximum(d * log_t, 0.0))
    else:  # "dist"
        r = math.sqrt(spec.thresh)
        shift_x = jnp.full_like(a, r)
        shift_y = jnp.full_like(a, r)
        det_ok = jnp.ones_like(det_ok)
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


_DET_EPS = 1e-14         # matches rasterize.DET_EPS (gaussian.cu:920)
_SUBLSB_ALPHA = 1.0 / 510.0   # half an 8-bit LSB: sub-visible with margin


def _q_min_box(a, b, c, d, lx, ux, ly, uy):
    """Exact minimum of Q(dx,dy) = d·dx² − (b+c)·dx·dy + a·dy² over the box
    [lx,ux]×[ly,uy] — the (unnormalized) kernel exponent of _chunk_alpha.

    Q is convex for PSD covariances, so the constrained minimum is 0 when
    the origin (the gaussian mean) lies in the box, else it sits on one of
    the four edges, each a 1-D quadratic minimized in closed form.  All
    branchless elementwise ops — ~40 VPU plane-ops per candidate.
    """
    A, B, C = d, -(b + c), a
    eps = jnp.float32(1e-20)

    def edge_dx(e):  # dx fixed at e: min over dy
        dy = jnp.clip(-B * e / (2.0 * C + eps), ly, uy)
        return A * e * e + B * e * dy + C * dy * dy

    def edge_dy(e):  # dy fixed at e: min over dx
        dx = jnp.clip(-B * e / (2.0 * A + eps), lx, ux)
        return A * dx * dx + B * dx * e + C * e * e

    qb = jnp.minimum(jnp.minimum(edge_dx(lx), edge_dx(ux)),
                     jnp.minimum(edge_dy(ly), edge_dy(uy)))
    inside = (lx <= 0) & (ux >= 0) & (ly <= 0) & (uy >= 0)
    return jnp.where(inside, 0.0, jnp.maximum(qb, 0.0))


@partial(jax.jit, static_argnames=("spec",))
def bin_gaussians(proj: ProjectedGaussians, spec: BinningSpec) -> BinnedPairs:
    """Projected gaussians → chunk-aligned per-tile depth-sorted pair lists."""
    n = proj.depth.shape[0]
    K, G = spec.max_tiles_per_gaussian, spec.chunk_size
    T = spec.n_tiles
    V = spec.visible_rows or n
    V = min(V, n)
    P = V * K
    NC, S = spec.num_chunks, spec.num_slots

    # ---- 1. depth order (front to back); one fused row gather ----------
    # Invisible gaussians key to +inf and sort behind all visible ones, so
    # the candidate plane only needs the first V rows.
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)            # (N,)
    inv_order = jnp.argsort(order).astype(jnp.int32)            # (N,)
    n_visible = jnp.sum(proj.visible)
    n_vis_dropped = jnp.maximum(n_visible - V, 0)
    packed_fields = jnp.concatenate(
        [proj.mean2d, proj.cov2d,
         proj.visible[:, None].astype(jnp.float32),
         jnp.zeros((n, 1), jnp.float32)], axis=1)               # (N, 8)
    ordered = jnp.take(packed_fields, order[:V], axis=0)
    mean2d, cov2d = ordered[:, :2], ordered[:, 2:6]
    visible = ordered[:, 6] > 0.5

    # ---- 2. dense (N, K) candidate plane — broadcasts only -------------
    x0, y0, rw, rh = _tile_bbox(spec, mean2d, cov2d, visible)
    count = jnp.minimum(rw * rh, K)                              # (N,)
    n_clipped = jnp.sum(jnp.maximum(rw * rh - K, 0))
    n_max_tiles = jnp.max(rw * rh)
    kk = jnp.arange(K, dtype=jnp.int32)[None, :]                 # (1, K)
    rw_safe = jnp.maximum(rw, 1)[:, None]
    ky = kk // rw_safe
    kx = kk - ky * rw_safe
    tile = (x0[:, None] + kx) + (y0[:, None] + ky) * spec.n_tile_x
    valid = kk < count[:, None]                                  # (N, K)
    if spec.method == "dist":
        # refine: tile-centre distance test (gaussian.cu:124-128)
        tcx = spec.leftmost + (x0[:, None] + kx + 0.5) * spec.tile_len_x
        tcy = spec.topmost + (y0[:, None] + ky + 0.5) * spec.tile_len_y
        d2 = ((mean2d[:, 0:1] - tcx) ** 2 + (mean2d[:, 1:2] - tcy) ** 2)
        valid = valid & (d2 < spec.thresh)
    n_pairs = jnp.sum(valid)
    pair_tile = jnp.where(valid, tile, T).reshape(P)
    pair_orig = jnp.broadcast_to(order[:V, None], (V, K)).reshape(P)
    flat = jax.lax.iota(jnp.int32, P)

    # ---- 3. stable sort by tile (preserves depth order per tile) -------
    sorted_tile, sorted_orig, sorted_flat = jax.lax.sort(
        (pair_tile, pair_orig, flat), num_keys=1, is_stable=True)

    # ---- 4. per-tile segments + chunk metadata (all at NC scale) -------
    starts = _searchsorted_2level(sorted_tile,
                                  jnp.arange(T + 1, dtype=jnp.int32))
    counts = jnp.diff(starts)                                    # (T,)
    # Empty tiles still get one (all-dead) chunk so the rasterizer writes
    # zeros into their output rows — pallas out blocks are never pre-zeroed.
    nchunk_t = jnp.maximum((counts + G - 1) // G, 1)             # (T,)
    chunk_cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(nchunk_t).astype(jnp.int32)])
    nc_used = chunk_cum[-1]
    n_dropped = jnp.maximum(nc_used - NC, 0)  # tiles past budget (in chunks)
    # A tile whose chunks don't all fit in the budget never fires its
    # chunk_last, so the pallas kernels never write (or only partially
    # composite) its output rows; the consumer must zero those rows
    # (otherwise uninitialized HBM reaches the loss — see rasterize()).
    tile_ok = jnp.concatenate(
        [chunk_cum[1:] <= NC, jnp.zeros((1,), jnp.bool_)])

    cids = jnp.arange(NC, dtype=jnp.int32)
    tile_of_chunk = jnp.clip(
        _count_le_small(chunk_cum, cids) - 1, 0, T - 1).astype(jnp.int32)
    chunk_used = cids < nc_used
    chunk_tile = jnp.where(chunk_used, tile_of_chunk, T)
    chunk_within = cids - chunk_cum[tile_of_chunk]
    chunk_first = chunk_used & (chunk_within == 0)
    chunk_last = chunk_used & (chunk_within == nchunk_t[tile_of_chunk] - 1)

    # ---- 5. aligned slots: broadcast src positions, ONE pair gather ----
    base = starts[tile_of_chunk] + chunk_within * G              # (NC,)
    end = starts[tile_of_chunk] + counts[tile_of_chunk]
    chunk_len = jnp.where(chunk_used,
                          jnp.clip(end - base, 0, G), 0).astype(jnp.int32)
    gg = jnp.arange(G, dtype=jnp.int32)[None, :]
    src = base[:, None] + gg                                     # (NC, G)
    slot_valid = (chunk_used[:, None] & (src < end[:, None])).reshape(S)
    src = jnp.clip(src.reshape(S), 0, P - 1)
    aligned_idx = jnp.where(slot_valid, sorted_orig[src], 0)
    aligned_idx = jnp.clip(aligned_idx, 0, n - 1)

    # ---- 6. backward route: aligned slot of every candidate ------------
    # For sorted position q in tile t's segment, the aligned slot is
    # q + shift[t] with shift[t] = chunk_cum[t]*G - starts[t].  shift is
    # piecewise constant over contiguous segments → build it with a tiny
    # (T-sized) scatter-add of deltas and a cumsum, never a pair-scale
    # gather.  A second sort by the flat payload inverts the tile sort.
    shift = chunk_cum[:-1] * G - starts[:-1]                     # (T,)
    shift_ext = jnp.concatenate([shift, jnp.full((1,), -P, jnp.int32)])
    deltas = jnp.diff(jnp.concatenate([shift_ext[:1] * 0, shift_ext]))
    delta_line = jnp.zeros((P,), jnp.int32).at[starts].add(
        deltas, mode="drop")
    shift_q = jnp.cumsum(delta_line)                             # (P,)
    qs = jax.lax.iota(jnp.int32, P)
    aligned_of_q = qs + shift_q
    # sentinel segment (tile T) got shift -P → negative = dead
    aligned_of_q = jnp.where(
        (aligned_of_q >= 0) & (aligned_of_q < S), aligned_of_q, -1)
    _, slot_of_pair = jax.lax.sort((sorted_flat, aligned_of_q), num_keys=1)

    return BinnedPairs(
        aligned_idx=aligned_idx,
        slot_valid=slot_valid,
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        chunk_last=chunk_last,
        chunk_len=chunk_len,
        tile_ok=tile_ok,
        slot_of_pair=slot_of_pair,
        inv_order=inv_order,
        n_pairs=n_pairs,
        n_clipped=n_clipped,
        n_dropped=n_dropped,
        n_max_tiles=n_max_tiles,
        n_visible=n_visible,
        n_vis_dropped=n_vis_dropped,
        n_chunks_used=nc_used,
    )


# ---------------------------------------------------------------------------
# fused sorted packing (gather-free fast path)
# ---------------------------------------------------------------------------
#
# The legacy pipeline below (bin_gaussians + pack_pairs) builds the
# chunk-aligned kernel buffers with one pair-scale row gather forward
# (~30 ms at Garden scale) and two pair-scale gathers backward (~48 ms).
# The fast path eliminates every pair-scale gather by making the tile sort
# itself produce the aligned buffers:
#
# 1. a key-only sort of the candidate tile ids yields per-tile counts;
# 2. each tile's segment is padded to a chunk multiple by injecting
#    (-count % G) zero-channel pad rows (opa=0 ⇒ alpha=0 ⇒ no-ops), built
#    as a (T, G-1) broadcast plane — sort payload cost is nearly
#    payload-count-independent on TPU (PERF.md), while gathers cost
#    ~7 ns/element;
# 3. ONE stable payload sort carries all channel values (broadcast to the
#    candidate plane, i.e. K-axis broadcasts, never gathered) plus the flat
#    candidate index; its output IS the chunk-aligned buffer;
# 4. backward: grads arrive per aligned row from the rasterizer; one sort
#    by the saved flat index restores candidate order, a reshape-sum
#    reduces the K axis, and an (N,)-scale row gather undoes the depth
#    ordering.
#
# (An element-offset manual-DMA variant — reading unaligned per-tile
# segments directly inside the kernel — fails to compile: Mosaic requires
# lane-axis DMA slices to be 128-divisible.  The pad-to-alignment sort
# achieves the same zero-gather property within those constraints.)


class PackedMeta(NamedTuple):
    """Chunk metadata + diagnostics for the sorted fast path."""

    chunk_tile: jnp.ndarray   # (NC,) tile id per chunk (n_tiles = unused)
    chunk_first: jnp.ndarray  # (NC,) bool
    chunk_last: jnp.ndarray   # (NC,) bool
    chunk_len: jnp.ndarray    # (NC,) valid pairs in this chunk (<= G)
    tile_ok: jnp.ndarray      # (T+1,) tile fully composited AND non-empty
    n_pairs: jnp.ndarray
    n_clipped: jnp.ndarray
    n_dropped: jnp.ndarray    # chunks past the NC budget
    n_max_tiles: jnp.ndarray
    n_visible: jnp.ndarray
    n_vis_dropped: jnp.ndarray
    # colcap diagnostics: per-column real fills m_k (the trainer retunes
    # col_caps from these) and pairs lost to column caps (0 in dense mode)
    col_fill: jnp.ndarray = None          # (K,) i32
    n_plane_clipped: jnp.ndarray = None   # ()
    n_chunks_used: jnp.ndarray = None     # () nc_used (slot retune signal)
    n_pad_used: jnp.ndarray = None        # () alignment pads needed
    n_pad_dropped: jnp.ndarray = None     # () pads past the pad_rows pool
    chunk_src: jnp.ndarray = None         # (NC,) post_align only: first
                                          # sorted row of each chunk (the
                                          # raster kernel realigns in-kernel,
                                          # RasterSpec.post_align)


def _pack_sorted_impl(spec: BinningSpec, geom_n, color_n, depth, visible):
    """Forward implementation; returns (packed, meta, residuals)."""
    assert not spec.gather_colors, \
        "gather_colors requires plane_mode='colcap'"
    assert not spec.cull_sublsb, \
        "cull_sublsb requires plane_mode='colcap'"
    assert not spec.bf16_pack, \
        "bf16_pack requires plane_mode='colcap' (packed payload rows are " \
        "built by the column-compacted plane)"
    assert not spec.quant_depth, \
        "quant_depth requires plane_mode='colcap'"
    n = depth.shape[0]
    K, G, T = spec.max_tiles_per_gaussian, spec.chunk_size, spec.n_tiles
    V = min(spec.visible_rows or n, n)
    P = V * K
    NC, S = spec.num_chunks, spec.num_slots
    padw = max(G - 1, 1)
    p_tot = P + T * padw
    L = max(p_tot, S)
    c_cols = color_n.shape[1]

    # ---- depth ordering (row-scale gathers only) ------------------------
    depth_key = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    n_visible = jnp.sum(visible)
    n_vis_dropped = jnp.maximum(n_visible - V, 0)
    geom_o = jnp.take(geom_n, order[:V], axis=0)          # (V, 8)
    color_o = jnp.take(color_n, order[:V], axis=0)        # (V, c)
    vis_o = jnp.take(visible, order[:V], axis=0)

    # ---- candidate plane ------------------------------------------------
    x0, y0, rw, rh = _tile_bbox(spec, geom_o[:, 0:2], geom_o[:, 2:6], vis_o)
    count = jnp.minimum(rw * rh, K)
    n_clipped = jnp.sum(jnp.maximum(rw * rh - K, 0))
    n_max_tiles = jnp.max(rw * rh)
    kk = jnp.arange(K, dtype=jnp.int32)[None, :]
    rw_safe = jnp.maximum(rw, 1)[:, None]
    ky = kk // rw_safe
    kx = kk - ky * rw_safe
    tile = (x0[:, None] + kx) + (y0[:, None] + ky) * spec.n_tile_x
    valid = kk < count[:, None]
    if spec.method == "dist":
        tcx = spec.leftmost + (x0[:, None] + kx + 0.5) * spec.tile_len_x
        tcy = spec.topmost + (y0[:, None] + ky + 0.5) * spec.tile_len_y
        d2 = ((geom_o[:, 0:1] - tcx) ** 2 + (geom_o[:, 1:2] - tcy) ** 2)
        valid = valid & (d2 < spec.thresh)
    n_pairs = jnp.sum(valid)
    pair_tile = jnp.where(valid, tile, T).reshape(P)

    # ---- key-only sort → per-tile counts + chunk metadata ---------------
    sorted_key = jax.lax.sort((pair_tile,), num_keys=1, is_stable=False)[0]
    starts = _searchsorted_2level(sorted_key,
                                  jnp.arange(T + 1, dtype=jnp.int32))
    counts = jnp.diff(starts)                              # (T,)
    nchunk_t = (counts + G - 1) // G                       # 0 for empty tiles
    chunk_cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(nchunk_t).astype(jnp.int32)])
    nc_used = chunk_cum[-1]
    n_dropped = jnp.maximum(nc_used - NC, 0)
    tile_ok = jnp.concatenate(
        [(counts > 0) & (chunk_cum[1:] <= NC), jnp.zeros((1,), jnp.bool_)])

    cids = jnp.arange(NC, dtype=jnp.int32)
    tile_of_chunk = jnp.clip(
        _count_le_small(chunk_cum, cids) - 1, 0, T - 1).astype(jnp.int32)
    chunk_used = cids < nc_used
    chunk_tile = jnp.where(chunk_used, tile_of_chunk, T)
    chunk_within = cids - chunk_cum[tile_of_chunk]
    chunk_first = chunk_used & (chunk_within == 0)
    chunk_last = chunk_used & (chunk_within == nchunk_t[tile_of_chunk] - 1)
    chunk_len = jnp.where(
        chunk_used,
        jnp.clip(counts[tile_of_chunk] - chunk_within * G, 0, G),
        0).astype(jnp.int32)

    # ---- alignment pads: (-count % G) rows per non-empty tile -----------
    pad_t = jnp.where(counts > 0, (-counts) % G, 0)        # (T,) < G
    jj = jnp.arange(padw, dtype=jnp.int32)[None, :]
    pad_keys = jnp.where(jj < pad_t[:, None],
                         jnp.arange(T, dtype=jnp.int32)[:, None],
                         T).reshape(T * padw)

    # ---- the payload sort: channels ride the sort -----------------------
    zpad = jnp.zeros((T * padw,), jnp.float32)
    key_full = jnp.concatenate([pair_tile, pad_keys])
    flat_full = jnp.concatenate(
        [jax.lax.iota(jnp.int32, P), jnp.full((T * padw,), P, jnp.int32)])

    def plane(col):  # (V,) channel → (P_tot,) candidate-plane broadcast
        return jnp.concatenate(
            [jnp.broadcast_to(col[:, None], (V, K)).reshape(P), zpad])

    # channel-major transpose once; per-channel reads become contiguous
    # rows (minor-axis column slices at V scale are strided relayouts)
    geom_t = geom_o.T                                      # (8, V)
    color_t = color_o.T                                    # (c, V)
    ops = (key_full, flat_full) \
        + tuple(plane(geom_t[j]) for j in range(7)) \
        + tuple(plane(color_t[j]) for j in range(c_cols))
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    sorted_flat = out[1]

    def fit(a, fill=0):  # length L, then slice the kernel window [0, S)
        if p_tot < L:
            a = jnp.concatenate(
                [a, jnp.full((L - p_tot,), fill, a.dtype)])
        return a[:S]

    # CHANNEL-MAJOR buffers (8, S)/(c8, S): stacking the sort outputs along
    # a new MINOR axis costs ~47 ms at Garden scale (a strided interleave),
    # while axis-0 stacking is contiguous copies (~1 ms); the pallas kernels
    # transpose the small (8, G) block in VMEM instead (~0.3 µs/chunk).
    zcol = jnp.zeros((S,), jnp.float32)
    geom_s = jnp.stack([fit(out[2 + j]) for j in range(7)] + [zcol], axis=0)
    c_pad = -c_cols % 8
    colors_s = jnp.stack(
        [fit(out[9 + j]) for j in range(c_cols)] + [zcol] * c_pad, axis=0)

    if p_tot < L:
        sorted_flat = jnp.concatenate(
            [sorted_flat, jnp.full((L - p_tot,), P, jnp.int32)])

    meta = PackedMeta(
        chunk_tile=chunk_tile, chunk_first=chunk_first,
        chunk_last=chunk_last, chunk_len=chunk_len, tile_ok=tile_ok,
        n_pairs=n_pairs, n_clipped=n_clipped, n_dropped=n_dropped,
        n_max_tiles=n_max_tiles, n_visible=n_visible,
        n_vis_dropped=n_vis_dropped,
        col_fill=jnp.zeros((K,), jnp.int32),
        n_plane_clipped=jnp.zeros((), jnp.int32),
        n_chunks_used=nc_used,
    )
    return (geom_s, colors_s), meta, (sorted_flat, inv_order, None)


def _searchsorted_2level(sorted_arr, queries):
    """Exact ``jnp.searchsorted(sorted_arr, queries)`` (side='left') for i32
    data, without XLA's serialized binary-search while loop.

    jnp.searchsorted lowers to a ~log2(P)-step ``while`` of tiny gathers —
    1.5 ms of the render frame at Garden scale (round-5 trace: while.13/14).
    This computes the same insertion points in two fused passes:

    1. window level: split the array into 128-lane windows; a window lies
       entirely below a query iff its tail < q (one (Q, P/128)
       compare-reduce, fused by XLA);
    2. in-window level: ONE contiguous row gather of each query's boundary
       window + a (Q, 128) compare-reduce.

    Sortedness gives exactness: windows past the boundary have every
    element >= tail(boundary) >= q, windows before it every element <= a
    tail < q, so count(< q) = 128 * n_full + in_row.
    """
    w = 128
    p = sorted_arr.shape[0]
    nw = -(-p // w)
    pad = nw * w - p
    if pad:
        fill = jnp.full((pad,), jnp.iinfo(sorted_arr.dtype).max,
                        sorted_arr.dtype)
        sorted_arr = jnp.concatenate([sorted_arr, fill])
    rows = sorted_arr.reshape(nw, w)
    tails = rows[:, -1]
    n_full = jnp.sum(tails[None, :] < queries[:, None],
                     axis=1).astype(jnp.int32)                    # (Q,)
    brow = jnp.take(rows, jnp.minimum(n_full, nw - 1), axis=0)    # (Q, w)
    in_row = jnp.sum(brow < queries[:, None], axis=1).astype(jnp.int32)
    return jnp.minimum(n_full * w + in_row, p).astype(jnp.int32)


def _count_le_small(sorted_small, queries):
    """``jnp.searchsorted(sorted_small, queries, side='right')`` as one
    broadcast compare-reduce (#(a <= q)) — for arrays small enough that a
    (Q, len) compare fuses cheaply (chunk_cum is (T+1,) ~ 4k)."""
    return jnp.sum(sorted_small[None, :] <= queries[:, None],
                   axis=1).astype(jnp.int32)


def _rank_bits_shift(n_tiles: int, v: int):
    """Composite-key layout: key = (tile << rb) | (depth_rank >> shift).

    rb leaves room for the sentinel tile id ``n_tiles``; shift quantizes the
    depth rank so it fits under the all-ones pad marker.  Depth resolution
    is 2^shift adjacent ranks (shift is 0 up to 262k visible rows at Garden
    tile counts — far finer than the reference's float key, which leaves
    only ~11 mantissa bits for depth, splatter.py:608-613).
    """
    rb = 31 - int(n_tiles).bit_length()
    shift = 0
    while (max(v, 2) - 1) >> shift >= (1 << rb) - 1:
        shift += 1
    return rb, shift


def _pack2_bf16(a, b):
    """Two f32 arrays → one i32 with (bf16(a) << 16) | bf16(b).

    Arithmetic bit packing — a minor-axis ``stack`` interleave at pair
    scale costs tens of ms on TPU (strided), while these are fused
    elementwise ops.
    """
    ai = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.int16).astype(jnp.int32)
    bi = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.int16).astype(jnp.int32)
    return jnp.left_shift(ai, 16) | (bi & jnp.int32(0xFFFF))


def _unpack2(packed):
    """i32 array → (hi, lo) f32 pair (inverse of :func:`_pack2_bf16`)."""
    hi = jax.lax.shift_right_arithmetic(packed, 16)
    lo = packed & jnp.int32(0xFFFF)

    def tofp(x):
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.int16), jnp.bfloat16).astype(jnp.float32)

    return tofp(hi), tofp(lo)


def _pack_color_cols(color_n):
    """(N, c) f32 → (N, ceil(c/2)) i32 of bf16 pairs (j | half+j).

    Row-gather cost on TPU cliffs with row width (measured: 56-64 B rows
    ~6.5 ns/row, 112-128 B rows ~23 ns/row at slot scale) — halving the SH
    color rows halves the dominant cost of the gather_colors route.  The
    (hi-block, lo-block) channel split keeps the unpack a contiguous
    concat, never an interleave.
    """
    n, c = color_n.shape
    half = (c + 1) // 2
    cols = [color_n[:, j] for j in range(c)]
    if c % 2:
        cols.append(jnp.zeros((n,), color_n.dtype))
    return jnp.stack([_pack2_bf16(cols[j], cols[half + j])
                      for j in range(half)], axis=1)


def _use_matrix(spec, c_cols: int) -> bool:
    """Whether the packed (N, 8)-i32 single-matrix gather path applies."""
    bx = int(spec.n_tile_x + 1).bit_length()
    by = int(spec.n_tile_y + 1).bit_length()
    n_extra = 1 + (0 if spec.gather_colors else c_cols)
    return bool(spec.bf16_pack or spec.packed_bf16) \
        and (2 * bx + 2 * by) <= 31 and 6 + (n_extra + 1) // 2 <= 8


def unpack2_bf16(packed):
    """(R, ...) i32 → (2R, ...) f32: [hi channels..., lo channels...].

    Inverse of the row-halves packing (row j holds channel j in the high
    16 bits and channel R+j in the low 16), so the unpacked concat is in
    channel order with no interleave.
    """
    hi, lo = _unpack2(packed)
    return jnp.concatenate([hi, lo], axis=0)


def _pack_sorted_colcap_impl(spec: BinningSpec, geom_n, color_n, depth,
                             visible, _stop: str | None = None):
    """Column-compacted forward: plane columns sliced to coverage prefixes.

    ``_stop`` (profiling only): return the named stage's outputs early so a
    scan-slope profiler can attribute cost below "pack" granularity —
    stages: order, cov, perm, gather, bbox, plane, keysort, meta, paysort.

    Rows are ordered coverage-descending (stable → depth order within equal
    coverage), so column k's real candidates occupy the first
    m_k = #rows(coverage > k) entries and each column is statically sliced
    to ``spec.col_caps[k]``.  The pair plane shrinks from V·K to ~Σ m_k —
    and every pair-scale sort/op cost with it (sorts cost ~2.6 ms per f32
    payload per 4M rows on v5e; pair scale is the only real lever,
    PERF.md).  Ordering is restored by the composite (tile, depth-rank)
    key; overflowing columns drop their deepest rows' pairs, reported via
    ``n_plane_clipped`` and retuned by the trainer like every other budget.
    """
    n = depth.shape[0]
    K, G, T = spec.max_tiles_per_gaussian, spec.chunk_size, spec.n_tiles
    V = min(spec.visible_rows or n, n)
    caps = spec.col_caps or (V,) * K
    assert len(caps) == K, (caps, K)
    caps = tuple(min(int(c_), V) for c_ in caps)
    P = sum(caps)
    NC, S = spec.num_chunks, spec.num_slots
    padw = max(G - 1, 1)
    full_pad = T * padw
    pool = full_pad if spec.pad_rows < 0 else min(int(spec.pad_rows),
                                                  full_pad)
    p_tot = P + pool
    L = max(p_tot, S)
    c_cols = color_n.shape[1]
    rb, shift = _rank_bits_shift(T, V)
    sent = jnp.int32(T << rb)
    pad_rank = jnp.int32((1 << rb) - 1)

    # ---- depth ordering (keys only — no row gathers yet) -----------------
    n_visible = jnp.sum(visible)
    n_vis_dropped = jnp.maximum(n_visible - V, 0)
    if spec.quant_depth:
        # rb-bit linear depth quantization instead of an exact rank: kills
        # both depth argsorts.  At Garden tile counts rb = 18 bits — far
        # finer than the reference's float key, which keeps only the ~11
        # mantissa bits left after the tile id (splatter.py:608-613).
        # Ties within one depth bin are broken by the stable composite
        # sort (deterministic, coverage-then-row order).  The visible-row
        # budget cut degrades into column-cap clipping (deepest rows of
        # each coverage class drop first) — n_vis_dropped still reports.
        depth_key = jnp.where(visible, depth, jnp.inf)
        dmin = jnp.min(depth_key)
        dmax = jnp.max(jnp.where(visible, depth, -jnp.inf))
        # cap the resolution at 20 bits: rb can reach ~28 on small tile
        # grids (tile-sharded render), and the composite coverage key needs
        # K << rb2 to stay under 31 bits
        qbits = min(rb, 20)
        qmax = (1 << qbits) - 2
        span = jnp.maximum(dmax - dmin, 1e-9)
        qd = (jnp.nan_to_num((depth - dmin) / span) * qmax)
        inv_order = jnp.clip(qd.astype(jnp.int32), 0, qmax)
        shift = 0
        in_budget = visible
        if _stop == "order":
            return (inv_order,), None, None
    else:
        depth_key = jnp.where(visible, depth, jnp.inf)
        order = jnp.argsort(depth_key).astype(jnp.int32)
        inv_order = jnp.argsort(order).astype(jnp.int32)  # depth rank
        # the visible-row budget cut is a mask, not a gather: rows whose
        # depth rank falls past V count as coverage 0, like invisible rows
        in_budget = visible & (inv_order < V)
        if _stop == "order":
            return (order, inv_order), None, None

    # ---- coverage + column fills in ORIGINAL order -----------------------
    x0a, y0a, rwa, rha = _tile_bbox(spec, geom_n[:, 0:2], geom_n[:, 2:6],
                                    in_budget)
    area = rwa * rha
    cov = jnp.minimum(area, K)
    n_clipped = jnp.sum(jnp.maximum(area - K, 0))
    n_max_tiles = jnp.max(area)
    m = jnp.stack([jnp.sum(cov > k) for k in range(K)])  # (K,) fills
    if _stop == "cov":
        return (inv_order, cov, m, n_clipped), None, None

    # ---- ONE composed permutation: coverage-major, depth-rank-minor ------
    # The old pipeline gathered all channel rows to depth order and then
    # AGAIN to coverage order (two (V, 8)+(V, c) row gathers, ~1%-of-HBM
    # XLA gather speed).  A composite integer key sorts straight from the
    # original order, the row gather happens once, and only the first
    # max(col_caps) rows — the only rows any column slice reads — move.
    rb2 = max(int(n - 1).bit_length(),
              min(rb, 20) if spec.quant_depth else 1, 1)
    assert (K << rb2) < (1 << 31), (K, rb2)
    # minor key: exact depth rank (unique) or quantized depth (ties broken
    # deterministically by jnp.argsort's stability)
    comp_key = ((K - cov) << rb2) | inv_order
    comp_order = jnp.argsort(comp_key).astype(jnp.int32)
    inv_comp = jnp.argsort(comp_order).astype(jnp.int32)
    if _stop == "perm":
        return (inv_order, comp_order, inv_comp), None, None
    v_rows = min(max(caps), V)                          # gathered window
    sel = comp_order[:v_rows]
    bx = int(spec.n_tile_x + 1).bit_length()
    by = int(spec.n_tile_y + 1).bit_length()
    # single-matrix gather (bf16_pack): everything the plane build needs —
    # f32 positions, bf16-paired cov/opa/color channels (the exact payload
    # rows the sort will carry), the N-scale bbox (already computed for the
    # column fills) bit-packed into one i32, and the depth rank — rides ONE
    # (N, 8)-i32 32-byte row gather + ONE transpose.  Replaces two row
    # gathers, two element gathers, a second transpose and a full bbox
    # recompute (the round-3d profile's gather+bbox = 9.8 ms of a 33 ms
    # pack, PERF.md round-4).
    use_mat = _use_matrix(spec, c_cols)
    if use_mat:
        def f2i(val):
            return jax.lax.bitcast_convert_type(val, jnp.int32)

        bbox_pk = (x0a | (y0a << bx) | (rwa << (bx + by))
                   | (rha << (2 * bx + by)))
        extra_n = [geom_n[:, 6]]
        if not spec.gather_colors:
            extra_n += [color_n[:, j] for j in range(c_cols)]
        if len(extra_n) % 2:
            extra_n.append(jnp.zeros((n,), jnp.float32))
        n_pk = len(extra_n) // 2
        cols_m = [f2i(geom_n[:, 0]), f2i(geom_n[:, 1]),
                  _pack2_bf16(geom_n[:, 2], geom_n[:, 3]),
                  _pack2_bf16(geom_n[:, 4], geom_n[:, 5])]
        cols_m += [_pack2_bf16(extra_n[2 * j], extra_n[2 * j + 1])
                   for j in range(n_pk)]
        cols_m += [bbox_pk, inv_order]
        while len(cols_m) < 8:                 # keep 32-byte rows
            cols_m.append(jnp.zeros((n,), jnp.int32))
        assert len(cols_m) == 8, (len(cols_m), c_cols)
        mat = jnp.stack(cols_m, axis=1)                    # (N, 8) i32
        mt = jnp.take(mat, sel, axis=0).T                  # (8, Vr)
        if _stop == "gather":
            return (inv_comp, mt), None, None
        xf = jax.lax.bitcast_convert_type(mt[0], jnp.float32)
        yf = jax.lax.bitcast_convert_type(mt[1], jnp.float32)
        ab = _unpack2(mt[2])
        cd = _unpack2(mt[3])
        ex = []
        for j in range(n_pk):
            h, l = _unpack2(mt[4 + j])
            ex += [h, l]
        # geom_t/color_t rows carry the bf16-roundtripped values the sort
        # payloads will carry anyway — the plane loop's repack is exact
        geom_t = jnp.stack([xf, yf, ab[0], ab[1], cd[0], cd[1], ex[0]],
                           axis=0)
        color_t = (None if spec.gather_colors
                   else jnp.stack(ex[1:1 + c_cols], axis=0))
        bb = mt[4 + n_pk]
        x0 = bb & ((1 << bx) - 1)
        y0 = (bb >> bx) & ((1 << by) - 1)
        rw = (bb >> (bx + by)) & ((1 << bx) - 1)
        rh = (bb >> (2 * bx + by)) & ((1 << by) - 1)
        rank = mt[5 + n_pk]
        if spec.gather_colors:
            # wide colors pre-packed to bf16 pairs: the slot-scale row
            # gather below runs on ceil(c/2)*4-byte rows (the >64 B row
            # cliff costs 3.5x per row, see _pack_color_cols)
            color_s = jnp.take(_pack_color_cols(color_n), sel, axis=0)
    else:
        geom_s = jnp.take(geom_n, sel, axis=0)              # (Vr, 8)
        color_s = jnp.take(color_n, sel, axis=0)            # (Vr, c)
        vis_s = jnp.take(in_budget, sel, axis=0)
        if _stop == "gather":
            return (inv_comp, geom_s, color_s, vis_s), None, None
        # ONE transpose to channel-major: every per-column channel read
        # below becomes a contiguous row slice.  Minor-axis column slices
        # of the (V, 8)/(V, c) gathered blocks are strided relayouts — K
        # columns x (7 + c) channels of them dominated the plane-build tail.
        geom_t = geom_s.T                                      # (8, V)
        color_t = color_s.T                                    # (c, V)
        x0, y0, rw, rh = _tile_bbox_rows(
            spec, geom_t[0], geom_t[1], geom_t[2], geom_t[3], geom_t[4],
            geom_t[5], vis_s)
        rank = jnp.take(inv_order, sel)                        # depth rank
    if _stop == "bbox":
        return (inv_comp, geom_t, color_t, x0, y0, rw, rh, rank), None, None

    # ---- per-column candidate slices ------------------------------------
    c_pad = -c_cols % 8
    c8 = c_cols + c_pad
    if spec.packed_bf16:
        # payload rows: geom (x|c, y|d, a|opa, b|blue) + colors (r|g) for
        # RGB — the blue channel rides the geometry block's free lo slot,
        # so the whole RGB render sort is key + 5 payloads; SH keeps pairs
        # of coefficients (j | j+c8/2).  Positions go tile-relative so bf16
        # keeps sub-pixel accuracy.  (A key+4 variant packing r/g/b/opa as
        # u8 lanes of one i32 row measured 17% SLOWER at bench occupancy —
        # the quantize/pack feeding the sort serialized against it, PERF.md
        # round-5 — so the 5-payload layout is the keeper.)
        n_geo_rows, n_col_rows = 4, (1 if c_cols == 3 else c8 // 2)
    elif spec.bf16_pack:
        # train-capable packed payloads: x, y stay f32; (a|b), (c|d) i32;
        # then (opa, color...) channels paired into i32 rows
        assert not spec.gather_geom
        n_extra = 1 + (0 if spec.gather_colors else c_cols)
        n_geo_rows, n_col_rows = 4 + (n_extra + 1) // 2, 0
    elif spec.gather_geom:
        # full gather route: the sort carries only (key, flat); geometry
        # AND colors move by post-sort row gathers
        assert spec.gather_colors, "gather_geom requires gather_colors"
        assert not spec.packed_bf16
        n_geo_rows, n_col_rows = 0, 0
    elif spec.gather_colors:
        # colors move by one post-sort row gather instead of riding the
        # sort — the payload-operand count stays at the RGB graph's 9
        # regardless of color width (27-coeff SH compiles and runs)
        assert not spec.packed_bf16
        n_geo_rows, n_col_rows = 7, 0
    else:
        n_geo_rows, n_col_rows = 7, c_cols
    assert not (spec.gather_colors and spec.packed_bf16), \
        "gather_colors and packed_bf16 are mutually exclusive"
    key_parts, flat_parts = [], []
    chan_parts = [[] for _ in range(n_geo_rows + n_col_rows)]
    off = 0
    n_plane_clipped = jnp.zeros((), jnp.int32)
    kk = jnp.int32
    for k in range(K):
        cpk = caps[k]
        rw_k = jnp.maximum(rw[:cpk], 1)
        ky = kk(k) // rw_k
        kx = kk(k) - ky * rw_k
        tile_k = (x0[:cpk] + kx) + (y0[:cpk] + ky) * spec.n_tile_x
        mk = jnp.minimum(m[k], cpk)
        valid_k = jax.lax.iota(jnp.int32, cpk) < mk
        if spec.method == "dist":
            tcx = spec.leftmost + (x0[:cpk] + kx + 0.5) * spec.tile_len_x
            tcy = spec.topmost + (y0[:cpk] + ky + 0.5) * spec.tile_len_y
            d2 = ((geom_t[0, :cpk] - tcx) ** 2
                  + (geom_t[1, :cpk] - tcy) ** 2)
            valid_k = valid_k & (d2 < spec.thresh)
        if spec.cull_sublsb:
            # keep the pair only if its alpha can exceed half an LSB
            # somewhere in the tile rect: opa·exp(−Qmin/pn) ≥ 1/510
            rx0 = spec.leftmost + (x0[:cpk] + kx).astype(jnp.float32) \
                * spec.tile_len_x
            ry0 = spec.topmost + (y0[:cpk] + ky).astype(jnp.float32) \
                * spec.tile_len_y
            cxk, cyk = geom_t[0, :cpk], geom_t[1, :cpk]
            ak, bk = geom_t[2, :cpk], geom_t[3, :cpk]
            ck_, dk = geom_t[4, :cpk], geom_t[5, :cpk]
            qmin = _q_min_box(ak, bk, ck_, dk,
                              rx0 - cxk, rx0 + spec.tile_len_x - cxk,
                              ry0 - cyk, ry0 + spec.tile_len_y - cyk)
            det_k = ak * dk - bk * ck_
            pn = 2.0 * det_k + _DET_EPS
            iso = jnp.maximum(
                jnp.log(jnp.maximum(geom_t[6, :cpk], 1e-12)
                        / _SUBLSB_ALPHA), 0.0)
            # conservative contract: cull only when PROVABLY sub-visible.
            # Gate on det <= 0, not pn <= 0: for det in (-_DET_EPS/2, 0]
            # pn stays positive but the covariance is indefinite, so
            # _q_min_box's convex edge-minimization no longer lower-bounds
            # the exponent — keep every det<=0 pair (possible under
            # method="dist", whose bbox stage skips the det check; the
            # rasterizer still draws them via _chunk_alpha's clamp)
            valid_k = valid_k & ((det_k <= 0) | (qmin <= pn * iso))
        key_k = jnp.where(
            valid_k,
            jnp.left_shift(tile_k, rb) | (rank[:cpk] >> shift), sent)
        key_parts.append(key_k)
        flat_parts.append(off + jax.lax.iota(jnp.int32, cpk))
        if spec.packed_bf16:
            tcx = spec.leftmost + ((x0[:cpk] + kx).astype(jnp.float32)
                                   + 0.5) * spec.tile_len_x
            tcy = spec.topmost + ((y0[:cpk] + ky).astype(jnp.float32)
                                  + 0.5) * spec.tile_len_y
            zero = jnp.zeros((cpk,), jnp.float32)
            rgb = c_cols == 3
            hi = [geom_t[0, :cpk] - tcx, geom_t[1, :cpk] - tcy,
                  geom_t[2, :cpk], geom_t[3, :cpk]]
            lo = [geom_t[4, :cpk], geom_t[5, :cpk], geom_t[6, :cpk],
                  color_t[2, :cpk] if rgb else zero]
            rows = [_pack2_bf16(h, l) for h, l in zip(hi, lo)]
            if rgb:
                rows.append(_pack2_bf16(color_t[0, :cpk],
                                        color_t[1, :cpk]))
            else:
                half = c8 // 2
                ccol = [color_t[j, :cpk] if j < c_cols else zero
                        for j in range(c8)]
                rows += [_pack2_bf16(ccol[j], ccol[half + j])
                         for j in range(half)]
        elif spec.bf16_pack:
            zero = jnp.zeros((cpk,), jnp.float32)
            extra = [geom_t[6, :cpk]]            # opa first
            if not spec.gather_colors:
                extra += [color_t[j, :cpk] for j in range(c_cols)]
            if len(extra) % 2:
                extra.append(zero)
            rows = [geom_t[0, :cpk], geom_t[1, :cpk],
                    _pack2_bf16(geom_t[2, :cpk], geom_t[3, :cpk]),
                    _pack2_bf16(geom_t[4, :cpk], geom_t[5, :cpk])]
            rows += [_pack2_bf16(extra[2 * j], extra[2 * j + 1])
                     for j in range(len(extra) // 2)]
        elif spec.gather_geom:
            rows = []
        elif spec.gather_colors:
            rows = [geom_t[j, :cpk] for j in range(7)]
        else:
            rows = [geom_t[j, :cpk] for j in range(7)] \
                + [color_t[j, :cpk] for j in range(c_cols)]
        for ci, col in enumerate(rows):
            chan_parts[ci].append(col)
        n_plane_clipped += jnp.maximum(m[k] - cpk, 0)
        off += cpk
    pair_key = jnp.concatenate(key_parts)
    n_pairs = jnp.sum(pair_key < sent)
    if _stop == "plane":
        return (pair_key, jnp.concatenate(flat_parts),
                tuple(jnp.concatenate(p) for p in chan_parts)), None, None

    # ---- key-only sort → per-tile counts + chunk metadata ---------------
    # full gather route: ONE stable (key, flat) sort serves both the
    # metadata (its sorted keys) and the slot map (its sorted flat ids) —
    # the separate key-only sort AND the padded payload sort disappear
    # (pads were T·(G−1) ≈ 0.4·P dead rows riding every sort operand;
    # slots map to sorted positions analytically, see below)
    post_align = spec.post_align and not spec.gather_geom
    if post_align and not spec.packed_bf16:
        # The realigned slot buffer holds only the candidates that landed in
        # live slots — NOT a full permutation of [0, P) — so the backward's
        # rank-slicing inversion (sort cotangents keyed on sorted_flat, then
        # per-column static slices) would silently misattribute gradients.
        # packed_bf16 is render-only (its bwd raises), so the preset is the
        # safe scope; a train extension needs the gather_geom-style
        # slot_pos route instead.
        raise ValueError("post_align requires packed_bf16 (render preset): "
                         "the padded sort IS the backward's alignment "
                         "contract on the train routes")
    if spec.gather_geom:
        sorted_key, sorted_flat = jax.lax.sort(
            (pair_key, jnp.concatenate(flat_parts)),
            num_keys=1, is_stable=True)
    elif post_align:
        # ONE stable payload sort over the real candidates only (no pad
        # rows): its keys feed the metadata below (replacing the key-only
        # sort), and chunk alignment is restored post-sort by a slot-scale
        # row gather.  Stability keeps equal-key (quantized-depth-tie)
        # candidates in plane order — same determinism contract as the
        # padded route's stable sort.
        ops = (pair_key,) + tuple(jnp.concatenate(p) for p in chan_parts)
        base = 1
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        sorted_key = out[0]
    else:
        sorted_key = jax.lax.sort((pair_key,), num_keys=1,
                                  is_stable=False)[0]
    if _stop == "keysort":
        return (pair_key, sorted_key,
                tuple(jnp.concatenate(p) for p in chan_parts)), None, None
    bounds = jnp.left_shift(jnp.arange(T + 1, dtype=jnp.int32), rb)
    starts = _searchsorted_2level(sorted_key, bounds)
    counts = jnp.diff(starts)                              # (T,)
    nchunk_t = (counts + G - 1) // G
    chunk_cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(nchunk_t).astype(jnp.int32)])
    nc_used = chunk_cum[-1]
    n_dropped = jnp.maximum(nc_used - NC, 0)
    tile_ok = jnp.concatenate(
        [(counts > 0) & (chunk_cum[1:] <= NC), jnp.zeros((1,), jnp.bool_)])

    cids = jnp.arange(NC, dtype=jnp.int32)
    tile_of_chunk = jnp.clip(
        _count_le_small(chunk_cum, cids) - 1, 0, T - 1).astype(jnp.int32)
    chunk_used = cids < nc_used
    chunk_tile = jnp.where(chunk_used, tile_of_chunk, T)
    chunk_within = cids - chunk_cum[tile_of_chunk]
    chunk_first = chunk_used & (chunk_within == 0)
    chunk_last = chunk_used & (chunk_within == nchunk_t[tile_of_chunk] - 1)
    chunk_len = jnp.where(
        chunk_used,
        jnp.clip(counts[tile_of_chunk] - chunk_within * G, 0, G),
        0).astype(jnp.int32)
    if _stop == "meta":
        return (pair_key, chunk_tile, chunk_first, chunk_last, chunk_len,
                tile_ok, tuple(jnp.concatenate(p) for p in chan_parts)
                ), None, None

    chunk_src = None
    if spec.gather_geom:
        # ---- analytic slot map (no pad rows, no second sort) -------------
        # slots are G-aligned per tile by construction, so slot s in chunk c
        # of tile t reads sorted position starts[t] + (s − G·chunk_cum[t]);
        # everything is chunk/slot-scale vector math off the metadata above
        # plus ONE (S,)-scale gather from the (P,) sorted flat ids
        src0 = starts[tile_of_chunk] + chunk_within * G          # (NC,)
        lane = jax.lax.iota(jnp.int32, G)
        src2 = src0[:, None] + lane[None, :]
        live2 = lane[None, :] < chunk_len[:, None]               # pads dead
        flat_s = jnp.where(
            live2, jnp.take(sorted_flat, jnp.clip(src2, 0, P - 1)),
            P).reshape(S)
        # backward route: slot of each SORTED position (S = "no slot"),
        # inverted in the bwd by one (key=flat, payload=slot) sort.  Unused
        # when pack_sorted is called outside the vjp (render) — XLA DCEs it.
        t_p = jnp.right_shift(sorted_key, rb)                    # (P,) ≤ T
        pos_t = jax.lax.iota(jnp.int32, P) - starts[t_p]
        chunk_p = chunk_cum[t_p] + pos_t // G
        slot_pos = jnp.where((t_p < T) & (chunk_p < NC),
                             G * chunk_cum[t_p] + pos_t, S)
        n_pad_used = jnp.zeros((), jnp.int32)     # no pad rows on this route
        n_pad_dropped = jnp.zeros((), jnp.int32)
    elif post_align:
        slot_pos = None
        n_pad_used = jnp.zeros((), jnp.int32)     # no pad rows on this route
        n_pad_dropped = jnp.zeros((), jnp.int32)
        if _stop == "paysort":
            return (out, chunk_len), None, None
        # ---- sorted-order packed buffers + per-chunk source offsets ------
        # No slot buffer is materialized at all: the rasterizer's forward
        # kernel realigns each chunk itself from TWO 128-lane windows of
        # the sorted payload (RasterSpec.post_align), addressed by
        # chunk_src = starts[t(c)] + G·chunk_within(c).  The jnp
        # compositor / oracle path realigns at XLA level instead
        # (ops/realign.realign_slots_xla) — an XLA gather here cost 6.3 ms
        # of a 19.9 ms frame (round-5 trace), more than the sort saved.
        chunk_src = starts[tile_of_chunk] + chunk_within * G     # (NC,)
    else:
        slot_pos = None
        # ---- alignment pads: (-count % G) rows per non-empty tile -------
        pad_t = jnp.where(counts > 0, (-counts) % G, 0)
        if pool < full_pad:
            # shared pool: pad slot j belongs to the tile whose cumulative
            # pad count first exceeds j (one searchsorted at pool scale)
            cum_pad = jnp.cumsum(pad_t).astype(jnp.int32)        # (T,)
            n_pad_used = cum_pad[-1]
            jp = jax.lax.iota(jnp.int32, pool)
            t_of_pad = jnp.searchsorted(
                cum_pad, jp, side="right").astype(jnp.int32)
            pad_keys = jnp.where(
                jp < jnp.minimum(n_pad_used, pool),
                jnp.left_shift(jnp.clip(t_of_pad, 0, T - 1), rb) | pad_rank,
                sent)
            n_pad_dropped = jnp.maximum(n_pad_used - pool, 0)
            # a short-padded tile shifts EVERY later tile's chunk base:
            # zero them all (fail-safe, reported, retuned by the trainer)
            first_bad = jnp.where(
                n_pad_dropped > 0,
                jnp.searchsorted(cum_pad, jnp.int32(pool),
                                 side="right").astype(jnp.int32), T)
            ok_t = jax.lax.iota(jnp.int32, T) < first_bad
            tile_ok = tile_ok & jnp.concatenate(
                [ok_t, jnp.ones((1,), jnp.bool_)])
        else:
            n_pad_used = jnp.sum(pad_t)
            n_pad_dropped = jnp.zeros((), jnp.int32)
            jj = jnp.arange(padw, dtype=jnp.int32)[None, :]
            tid = jnp.arange(T, dtype=jnp.int32)[:, None]
            pad_keys = jnp.where(jj < pad_t[:, None],
                                 jnp.left_shift(tid, rb) | pad_rank,
                                 sent).reshape(full_pad)

        # ---- the payload sort: channels ride the sort -------------------
        # (sort cost is per-OPERAND on TPU; the render-only packed_bf16
        # preset drops the `flat` backward-map payload entirely — its
        # backward is NotImplemented anyway)
        def with_pad(parts):
            return jnp.concatenate(
                parts + [jnp.zeros((pool,), parts[0].dtype)])

        key_full = jnp.concatenate([pair_key, pad_keys])
        if spec.packed_bf16:
            ops = (key_full,) + tuple(with_pad(p) for p in chan_parts)
            base = 1
        else:
            flat_full = jnp.concatenate(
                [jnp.concatenate(flat_parts),
                 jnp.full((pool,), P, jnp.int32)])
            ops = (key_full, flat_full) + tuple(
                with_pad(p) for p in chan_parts)
            base = 2
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        if _stop == "paysort":
            return (out, chunk_len), None, None

    def fit(a, fill=0):
        if p_tot < L:
            a = jnp.concatenate(
                [a, jnp.full((L - p_tot,), fill, a.dtype)])
        return a[:S]

    if spec.packed_bf16:
        sorted_flat = jnp.zeros((1,), jnp.int32)  # no backward route
        if post_align:
            # sorted-order buffers, lane-padded so the kernel's second
            # window ((chunk_src >> 7) + 1) always exists; chunk_src is
            # clamped into the padded range (dead chunks read arbitrary
            # windows, masked to no-ops by chunk_len == 0)
            p_pad = (-(-(P + 1) // G) + 1) * G

            def lanepad(a):
                return jnp.concatenate(
                    [a, jnp.zeros((p_pad - P,), a.dtype)])

            geom_pk = jnp.stack(
                [lanepad(out[base + j]) for j in range(n_geo_rows)], axis=0)
            colors_pk = jnp.stack(
                [lanepad(out[base + n_geo_rows + j])
                 for j in range(n_col_rows)],
                axis=0)
            chunk_src = jnp.clip(chunk_src, 0, p_pad - 2 * G)
        else:
            geom_pk = jnp.stack(
                [fit(out[base + j]) for j in range(n_geo_rows)], axis=0)
            colors_pk = jnp.stack(
                [fit(out[base + n_geo_rows + j])
                 for j in range(n_col_rows)], axis=0)
    else:
        if not spec.gather_geom:
            sorted_flat = out[1]
            if spec.gather_colors:
                flat_s = fit(sorted_flat, fill=P)          # (S,)
        if spec.gather_colors:
            # slot → source row: candidate index p in column k is
            # off_k + row, so the inverse is K static range tests at slot
            # scale; pad slots (flat == P) point at the appended zero row
            row = jnp.full((S,), v_rows, jnp.int32)
            offp = 0
            for cpk in caps:
                in_k = (flat_s >= offp) & (flat_s < offp + cpk)
                row = jnp.where(in_k, flat_s - offp, row)
                offp += cpk
            if use_mat:
                # color_s is bf16-pair packed (Vr, ceil(c/2)) i32: gather
                # the narrow rows, then unpack as a contiguous hi/lo concat
                color_g = jnp.pad(color_s, ((0, 1), (0, 0)))
                pk2 = jnp.take(color_g, row, axis=0)      # (S, half) i32
                hi, lo = _unpack2(pk2)
                colors_pk = jnp.concatenate([hi, lo], axis=1)  # (S, 2*half)
                if colors_pk.shape[1] < c8:
                    colors_pk = jnp.pad(
                        colors_pk, ((0, 0), (0, c8 - colors_pk.shape[1])))
            else:
                color_g = jnp.pad(color_s, ((0, 1), (0, c_pad)))
                colors_pk = jnp.take(color_g, row, axis=0)  # (S, c8) ROW-major
        if spec.gather_geom:
            # geometry by the same map: 7 real channels + zero 8th column
            # (pad row AND pad column in one jnp.pad)
            geom_g = jnp.pad(geom_s[:, :7], ((0, 1), (0, 1)))  # (Vr+1, 8)
            geom_pk = jnp.take(geom_g, row, axis=0)            # (S, 8) ROW-major
        else:
            zcol = jnp.zeros((S,), jnp.float32)
            if spec.bf16_pack:
                # unpack the bf16-paired payloads back to the standard f32
                # channel-major buffers (elementwise; downstream unchanged)
                x_s, y_s = fit(out[base + 0]), fit(out[base + 1])
                a_s, b_s = _unpack2(fit(out[base + 2]))
                c_s, d_s = _unpack2(fit(out[base + 3]))
                n_extra = 1 + (0 if spec.gather_colors else c_cols)
                extra = []
                for j in range((n_extra + 1) // 2):
                    h, l = _unpack2(fit(out[base + 4 + j]))
                    extra += [h, l]
                geom_pk = jnp.stack(
                    [x_s, y_s, a_s, b_s, c_s, d_s, extra[0], zcol], axis=0)
                if not spec.gather_colors:
                    colors_pk = jnp.stack(
                        extra[1:1 + c_cols] + [zcol] * c_pad, axis=0)
            else:
                geom_pk = jnp.stack(
                    [fit(out[base + j]) for j in range(7)] + [zcol], axis=0)
                if not spec.gather_colors:
                    colors_pk = jnp.stack(
                        [fit(out[base + 7 + j]) for j in range(c_cols)]
                        + [zcol] * c_pad, axis=0)
            if p_tot < L:
                sorted_flat = jnp.concatenate(
                    [sorted_flat, jnp.full((L - p_tot,), P, jnp.int32)])

    meta = PackedMeta(
        chunk_tile=chunk_tile, chunk_first=chunk_first,
        chunk_last=chunk_last, chunk_len=chunk_len, tile_ok=tile_ok,
        n_pairs=n_pairs, n_clipped=n_clipped, n_dropped=n_dropped,
        n_max_tiles=n_max_tiles, n_visible=n_visible,
        n_vis_dropped=n_vis_dropped,
        col_fill=m, n_plane_clipped=n_plane_clipped,
        n_chunks_used=nc_used,
        n_pad_used=n_pad_used, n_pad_dropped=n_pad_dropped,
        chunk_src=chunk_src,
    )
    return (geom_pk, colors_pk), meta, (sorted_flat, inv_comp, slot_pos)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def pack_sorted(spec: BinningSpec, geom_n, color_n, depth, visible):
    """Depth-order, bin, align and pack in one sort — zero pair-scale gathers.

    Args:
      spec: static binning configuration.
      geom_n: (N, 8) [x, y, cov_a, cov_b, cov_c, cov_d, opa, 0] original order.
      color_n: (N, C) colors / SH coefficients (C = 3 or 27).
      depth: (N,) camera depth (ordering only — no gradient, matching the
        reference whose draw backward never writes a depth grad,
        gaussian.cu:785-786).
      visible: (N,) bool frustum mask.

    Returns (packed, meta): packed = (geom (8, S), colors (ceil8(C), S))
    CHANNEL-MAJOR chunk-aligned buffers (consume with a raster spec carrying
    ``channel_major=True``), meta = :class:`PackedMeta`.
    """
    impl = (_pack_sorted_colcap_impl if spec.plane_mode == "colcap"
            else _pack_sorted_impl)
    packed, meta, _ = impl(spec, geom_n, color_n, depth, visible)
    return packed, meta


def _pack_sorted_fwd(spec, geom_n, color_n, depth, visible):
    impl = (_pack_sorted_colcap_impl if spec.plane_mode == "colcap"
            else _pack_sorted_impl)
    packed, meta, res = impl(spec, geom_n, color_n, depth, visible)
    n = geom_n.shape[0]
    return (packed, meta), (res, n, color_n.shape[1], depth, visible)


def _pack_sorted_bwd(spec, residuals, cts):
    if spec.packed_bf16:
        raise NotImplementedError(
            "packed_bf16 is a render-only preset (bf16 channel payloads); "
            "train with packed_bf16=False — the f32 path is the "
            "differentiable one")
    (sorted_flat, inv_a, inv_b), n, c_cols, depth, visible = residuals
    (g_geom, g_color), _g_meta = cts
    K, G = spec.max_tiles_per_gaussian, spec.chunk_size
    S = spec.num_slots
    L = sorted_flat.shape[0]
    V = min(spec.visible_rows or n, n)
    if spec.plane_mode == "colcap":
        caps = spec.col_caps or (V,) * K
        caps = tuple(min(int(c_), V) for c_ in caps)
        P = sum(caps)
        v_rows = min(max(caps), V)
    else:
        P = V * K
        v_rows = V

    def unfit(col):  # (S,) cotangent row → (L,)
        if L > S:
            col = jnp.concatenate([col, jnp.zeros((L - S,), col.dtype)])
        return col

    gather = spec.gather_colors and spec.plane_mode == "colcap"
    gather_g = spec.gather_geom and spec.plane_mode == "colcap"
    if gather_g:
        # single-sort route: the forward saved each sorted position's slot
        # (S = "no slot"); ONE (flat, slot) sort puts slots in candidate
        # order, then geometry and color cotangents move by row gathers
        slot_pos = inv_b
        s_of_p = jax.lax.sort((sorted_flat, slot_pos), num_keys=1,
                              is_stable=False)[1]          # (P,)
        geom_out = ()
    else:
        # cotangents arrive channel-major (8, S)/(c8, S) — rows are
        # contiguous ((S, ·) ROW-major blocks on the gather_colors route)
        if spec.bf16_pack:
            # inverse sort rides packed cotangents too: position grads
            # (densification signal) stay f32, the rest pair up as bf16
            gg = [unfit(g_geom[j]) for j in range(7)]
            extra = [gg[6]]
            if not gather:
                extra += [unfit(g_color[j]) for j in range(c_cols)]
            if len(extra) % 2:
                extra.append(jnp.zeros_like(gg[6]))
            cols = (gg[0], gg[1], _pack2_bf16(gg[2], gg[3]),
                    _pack2_bf16(gg[4], gg[5])) + tuple(
                _pack2_bf16(extra[2 * j], extra[2 * j + 1])
                for j in range(len(extra) // 2))
        else:
            cols = tuple(unfit(g_geom[j]) for j in range(7))
            if not gather:
                cols += tuple(unfit(g_color[j]) for j in range(c_cols))
        if gather:
            # color cotangent is (S, c8) ROW-major (the forward gathered
            # it); instead of riding c8 payloads, ride ONE iota payload to
            # learn each candidate's slot, then move the color rows with
            # ONE row gather
            cols = (jnp.arange(L, dtype=jnp.int32),) + cols
        # one sort inverts the tile sort (pads carry sentinel key P →
        # sort last)
        out = jax.lax.sort((sorted_flat,) + cols, num_keys=1,
                           is_stable=False)
        if spec.bf16_pack:
            # unpack back to the 7(+c) f32 cotangent columns the reduction
            # expects; `out` is rebuilt so the slicing below is unchanged
            o = 2 if gather else 1
            a_b = _unpack2(out[o + 2])
            c_d = _unpack2(out[o + 3])
            n_extra = 1 + (0 if gather else c_cols)
            extra_u = []
            for j in range((n_extra + 1) // 2):
                h, l = _unpack2(out[o + 4 + j])
                extra_u += [h, l]
            out = out[:o] + (out[o], out[o + 1], a_b[0], a_b[1],
                             c_d[0], c_d[1], extra_u[0]) \
                + tuple(extra_u[1:1 + (0 if gather else c_cols)])
    if gather:
        if not gather_g:
            s_of_p = out[1]                   # (L,) slot per candidate rank
            geom_out = out[2:9]
        c8 = g_color.shape[1]
        if spec.bf16_pack and _use_matrix(spec, c_cols):
            # pack the color cotangents the same way the forward packed the
            # values: bf16 pairs → half-width rows through the slot-scale
            # gather (>64 B rows cost 3.5x per row, _pack_color_cols)
            half = (c_cols + 1) // 2
            gcols = [g_color[:, j] for j in range(2 * half)]
            g_pk = jnp.stack(
                [_pack2_bf16(gcols[j], gcols[half + j])
                 for j in range(half)], axis=1)            # (S, half) i32
            g_p = jnp.concatenate(
                [g_pk, jnp.zeros((1, half), jnp.int32)], axis=0)
            pk2 = jnp.take(g_p, jnp.minimum(s_of_p, S), axis=0)
            hi, lo = _unpack2(pk2)
            g_color_cand = jnp.concatenate([hi, lo], axis=1)  # (L, 2*half)
        else:
            g_color_p = jnp.concatenate(
                [g_color, jnp.zeros((1, c8), g_color.dtype)], axis=0)
            # candidates whose slot fell past the budget (or fit-padding)
            # read the appended zero row
            g_color_cand = jnp.take(
                g_color_p, jnp.minimum(s_of_p, S), axis=0)     # (L, c8)
    else:
        geom_out = out[1:8]

    def reduce_rows_2d(cand):
        # per-column slice-adds: candidate order → (v_rows, ...) row sums.
        # column k's grads live at a static slice of the column-major plane,
        # so the per-row reduction over covered columns is K slice-adds at
        # row scale (no pair-scale gathers).  Shape-generic: accepts (P,)
        # cotangent rows and (P, C) row blocks alike.
        acc = jnp.zeros((v_rows,) + cand.shape[1:], cand.dtype)
        off = 0
        for cpk in caps:
            seg = cand[off:off + cpk]
            if cpk < v_rows:
                seg = jnp.concatenate(
                    [seg, jnp.zeros((v_rows - cpk,) + seg.shape[1:],
                                    seg.dtype)], axis=0)
            acc = acc + seg
            off += cpk
        return acc

    if spec.plane_mode == "colcap":
        reduce_rows = reduce_rows_2d
    else:
        def reduce_rows(col):  # candidate order → (V,) depth-row sums
            return col[:P].reshape(V, K).sum(axis=1)

    if gather_g:
        # geometry cotangent (S, 8) ROW-major → one row gather, 2D reduce;
        # the 8th column (kernel-written zeros) is re-zeroed for exactness
        g_geom_p = jnp.concatenate(
            [g_geom, jnp.zeros((1, g_geom.shape[1]), g_geom.dtype)], axis=0)
        g_geom_cand = jnp.take(
            g_geom_p, jnp.minimum(s_of_p, S), axis=0)      # (L, 8)
        gg = reduce_rows_2d(g_geom_cand)
        g_geom_rows = jnp.concatenate(
            [gg[:, :7], jnp.zeros((v_rows, 1), gg.dtype)], axis=1)
    else:
        rows = [reduce_rows(c) for c in geom_out]
        # axis-0 stack (contiguous) + one tiled transpose instead of a
        # minor-axis interleave stack (measured ~47 ms per 2.3M rows)
        g_geom_rows = jnp.stack(
            rows + [jnp.zeros((v_rows,), jnp.float32)], axis=0).T
    if gather:
        g_color_rows = reduce_rows_2d(g_color_cand)[:, :c_cols]
    else:
        g_color_rows = jnp.stack(
            [reduce_rows(unfit_out) for unfit_out in out[8:]], axis=0).T

    def expand(rows_v, inv):  # (rows, C) → original order (N, C)
        r = rows_v.shape[0]
        if r < n:
            rows_v = jnp.concatenate(
                [rows_v, jnp.zeros((n - r,) + rows_v.shape[1:],
                                   rows_v.dtype)], axis=0)
        return jnp.take(rows_v, inv, axis=0)

    import numpy as _np

    # rows are in composed coverage order (colcap) / depth order (dense):
    # ONE gather restores the original order.  (The old colcap pipeline
    # paid an extra inv_cov (V, 8)+(V, c8) row gather here before the
    # inv_order one — ~XLA-gather speed, the single biggest fusion in the
    # train-step trace.)
    return (expand(g_geom_rows, inv_a), expand(g_color_rows, inv_a),
            jnp.zeros_like(depth),
            _np.zeros(visible.shape, jax.dtypes.float0))


pack_sorted.defvjp(_pack_sorted_fwd, _pack_sorted_bwd)


# ---------------------------------------------------------------------------
# channel packing (with a gather-only custom backward)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gather_rows(chans, aligned_idx, slot_valid, slot_of_pair, inv_order,
                 k_width):
    """Gather per-pair channel groups into aligned slots.

    ``chans`` is a tuple of (N, <=8)-column groups: 32-byte rows gather ~6x
    faster than 64-byte rows on TPU, and keeping groups as separate arrays
    end-to-end (instead of slicing one wide array) avoids a ~28 ms layout
    conversion between gather outputs and pallas block inputs.
    """
    # dead-slot masking happens inside the rasterizer kernels via the
    # per-chunk valid length (saves two (S,8)-scale multiplies per pass);
    # slot_valid/aligned_idx clamping keep the gathered rows in-bounds.
    del slot_valid
    return tuple(jnp.take(c, aligned_idx, axis=0) for c in chans)


def _gather_rows_fwd(chans, aligned_idx, slot_valid, slot_of_pair, inv_order,
                     k_width):
    out = _gather_rows(chans, aligned_idx, slot_valid, slot_of_pair,
                       inv_order, k_width)
    return out, (chans[0].shape[0], aligned_idx, slot_valid, slot_of_pair,
                 inv_order)


def _gather_rows_bwd(k_width, res, gs):
    n, aligned_idx, slot_valid, slot_of_pair, inv_order = res
    s = gs[0].shape[0]
    p = slot_of_pair.shape[0]
    v = p // k_width                 # candidate-plane rows (visible budget)
    pair_ok = (slot_of_pair >= 0)[:, None]
    safe = jnp.clip(slot_of_pair, 0, s - 1)
    grads = []
    for g in gs:
        gp = jnp.take(g, safe, axis=0) * pair_ok.astype(g.dtype)
        # reduce candidates per DEPTH ROW, pad dropped/invisible rows,
        # then back to original order
        grad_rows = gp.reshape(v, k_width, g.shape[1]).sum(axis=1)
        if v < n:
            grad_rows = jnp.concatenate(
                [grad_rows, jnp.zeros((n - v, g.shape[1]), g.dtype)], axis=0)
        grads.append(jnp.take(grad_rows, inv_order, axis=0))
    import numpy as _np

    z = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
    return (tuple(grads), z(aligned_idx), z(slot_valid), z(slot_of_pair),
            z(inv_order))


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def pack_pairs(binned: BinnedPairs, proj: ProjectedGaussians, opa, color,
               k_width: int | None = None):
    """Gather per-pair channel data into (S, 8)-group packed layout.

    Returns (geom, colors): geom columns [x, y, cov_a, cov_b, cov_c, cov_d,
    opa, 0]; colors padded to a multiple of 8.  The backward is gather-only
    (see _gather_rows) — the pair->gaussian gradient reduction the CUDA
    backward implements with warp shuffles + atomics (gaussian.cu:676-772)
    becomes reshape-sums plus an inverse-permutation gather.
    """
    n = opa.shape[0]
    geom = jnp.concatenate(
        [proj.mean2d, proj.cov2d, opa[:, None],
         jnp.zeros((n, 1), opa.dtype)], axis=1)        # (N, 8)
    c_pad = -color.shape[1] % 8
    col = jnp.concatenate(
        [color] + ([jnp.zeros((n, c_pad), color.dtype)] if c_pad else []),
        axis=1)
    col_groups = tuple(col[:, i:i + 8] for i in range(0, col.shape[1], 8))
    if k_width is None:
        # default: full-table candidate plane (P = N*K)
        k_width = binned.slot_of_pair.shape[0] // n
    out = _gather_rows((geom,) + col_groups, binned.aligned_idx,
                       binned.slot_valid, binned.slot_of_pair,
                       binned.inv_order, k_width)
    geom_s = out[0]
    colors_s = jnp.concatenate(out[1:], axis=1) if len(out) > 2 else out[1]
    return geom_s, colors_s
