"""Configuration dataclasses mirroring the reference CLI surface.

The reference exposes ~50 argparse flags (``/root/reference/train.py:296-361``)
that flow into ``Splatter`` kwargs (``train.py:374-392``) and trainer
behaviour.  Here the same knobs are grouped into two dataclasses:

- :class:`SplatConfig` — scene / rendering model options
  (``splatter.py:324-345`` constructor kwargs).
- :class:`TrainConfig` — optimization schedule, losses, adaptive density
  control, evaluation cadence (``train.py:296-361``).

TPU-specific additions (capacities, chunk sizes, pallas toggles) live in
:class:`SplatConfig` as well; they control static shapes and therefore
recompilation buckets, something the CUDA reference never had to care about.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class SplatConfig:
    # --- scene / model options (reference splatter.py:324-345) ---
    near: float = 0.3
    use_sh_coeff: bool = False
    render_weight_normalize: bool = False
    opa_init_value: float = 0.3
    scale_init_value: float = 1.0
    tile_culling_method: str = "prob2"      # dist | prob | prob2
    tile_culling_dist_thresh: float = 0.5
    tile_culling_prob_thresh: float = 0.05
    scale_activation: str = "abs"           # abs | exp
    fast_drawing: bool = True
    render_downsample: int = 4

    # --- TPU static-shape controls (no CUDA equivalent) ---
    # Maximum number of (gaussian, tile) intersection pairs emitted per
    # gaussian (the dense candidate-plane width).  The reference instead
    # caps per-tile capacity at N//20 (splatter.py:569) and silently drops
    # overflow; we cap per-gaussian tile-bbox coverage, which bounds the
    # candidate sort.  Every pair-scale cost is proportional to V*K, and at
    # Garden scale 99.96% of pairs fit in K=6 (measured coverage histogram:
    # modes at 2 and 4 tiles); the trainer grows K when the clipped
    # fraction exceeds 0.5% of pairs (n_clipped is tracked per step).
    max_tiles_per_gaussian: int = 6
    # Hard ceiling for the trainer's K growth, plus a candidate-plane row
    # budget it must respect while growing (degenerate splats can cover
    # thousands of tiles — n_max_tiles ~ the whole grid — and chasing that
    # coverage compiles a plane large enough to OOM the TPU worker).
    max_tiles_cap: int = 64
    max_plane_rows: int = 16_777_216
    # Gaussian-chunk length processed per pallas grid step (the VMEM staging
    # analogue of the reference's SMSIZE shared-memory chunks,
    # gaussian.cu:998-1022).  Must be a multiple of 128 (TPU lanes).
    chunk_size: int = 128
    # Tile shape in pixels.  16x16 matches the reference block size
    # (gaussian.cu:993-996); the pallas kernel flattens the 256 pixels into
    # the sublane axis, so any (th, tw) with th*tw % 8 == 0 works.
    tile_h: int = 16
    tile_w: int = 16
    # capacity bucketing: gaussian table capacity is rounded up to a multiple
    # of this, so densification only recompiles when crossing a bucket edge.
    capacity_round: int = 65536
    # Hard ceiling on table capacity (0 = unlimited).  At the ceiling,
    # densification keeps deleting/splitting within the fixed table but
    # clone/split proposals that do not fit are dropped (the unlimited
    # mode's grow-and-rerun never drops).  Used by quality-proof runs that
    # must stay below the GT gaussian count.
    max_capacity: int = 0
    # Aligned-slot budget beyond the one-chunk-per-tile floor: explicit
    # capacity wins; otherwise pair_factor * table capacity.  The trainer
    # retunes this from observed n_pairs (dead pair slots cost rasterizer
    # grid steps).
    pair_capacity: Optional[int] = None
    pair_factor: float = 3.0
    # Candidate-plane visible-row budget (None = table capacity); retuned by
    # the trainer from observed per-view visibility.  Every pair-scale cost
    # in binning is proportional to this.
    visible_rows: Optional[int] = None
    # use the pallas kernel (False falls back to the pure-jnp tiled renderer,
    # which is also the test oracle).
    use_pallas: bool = True
    # gather-free data path: the tile sort carries all channel values as
    # payloads and emits chunk-aligned kernel buffers directly
    # (ops/binning.pack_sorted).  False = legacy bin_gaussians + pack_pairs
    # (pair-scale gathers; kept as the cross-check/oracle route).
    fused_pack: bool = True
    # candidate-plane construction for the fused path (ops/binning):
    # "colcap" slices each plane column to its coverage prefix (pair scale
    # ~= real pair count instead of V*K); "dense" is the (V, K) plane.
    plane_mode: str = "colcap"
    # static per-column row caps for colcap (None = start at visible_rows
    # per column and let the trainer retune from observed column fills)
    col_caps: Optional[tuple] = None
    # Shared alignment-pad pool for the payload sort (ops/binning pad_rows):
    # -1 reserves the T*(G-1) worst case (always correct); >= 0 caps the
    # static pad block at this many rows — the observed need is ~0.12x the
    # worst case at Garden scale, and every payload-sort operand carries the
    # reservation.  Overflow is fail-safe (tiles past the break render zero,
    # n_pad_dropped reported) and the trainer retunes it like every other
    # static budget.
    pad_rows: int = -1
    # Post-sort alignment for the render preset (ops/binning post_align):
    # sort only the real candidate rows (no alignment-pad rows, and the
    # payload sort's keys replace the separate key-only metadata sort),
    # then restore chunk alignment with one slot-scale row gather.  At the
    # Garden preset the real pairs fit lax.sort's 2^20 row bucket while
    # pairs+pads pay the 2^21 one (PERF.md round-5 trace: paysort 5.65 ms
    # of a 19.9 ms frame).  packed_bf16-only (render has no backward; the
    # padded sort IS the train routes' gradient-alignment contract).
    # -1 = auto (ON whenever packed_bf16 is); 0/1 force.
    post_align: int = -1
    # Sub-tile early termination: lane-axis split count for the forward
    # kernel's saturation gate (1 = whole-tile gate, 2 = independent
    # 128-lane halves — the CUDA per-pixel break at half-tile granularity)
    px_split: int = 1
    # RENDER-ONLY preset: bf16 channel pairs bitcast into i32 sort payloads
    # (halves payload-sort operands) with tile-relative positions; no
    # backward — the trainer must keep this False (viewer/bench FPS paths
    # flip it on a render-only config copy)
    packed_bf16: bool = False
    # Wide-color fast path: colors move by one post-sort row gather instead
    # of riding the payload sort (ops/binning gather_colors).  -1 = auto
    # (on for SH's 27 coefficients, whose 36-operand payload sort never
    # finishes compiling on TPU, PERF.md round-3; off for 3-channel RGB,
    # where 3 payloads are cheaper than a slot-scale gather); 0/1 force.
    gather_colors: int = -1
    # Full gather route (implies gather_colors): the payload sort carries
    # only (key, flat) — TWO operands — and geometry moves by the same
    # post-sort row gather as colors (ops/binning gather_geom).  -1 = auto
    # (currently off pending TPU A/B measurement); 0/1 force.
    gather_geom: int = -1
    # Quantized depth keys (ops/binning quant_depth): depth enters the pack
    # sort as an 18-bit linear quantization instead of an exact rank —
    # both depth argsorts disappear (~1.3 ms/frame at Garden scale).
    # Still finer than the reference's ~11-mantissa-bit float key.
    # -1 = auto (ON when compatible: fused colcap); 0/1 force.
    quant_depth: int = -1
    # Train-capable packed payload sort (ops/binning bf16_pack): cov, opa
    # and color channels ride the fused pack's payload sort as bf16 pairs
    # bitcast into i32 operands (positions and their grads stay f32), and
    # the backward's inverse sort packs its cotangents the same way —
    # forward 12 → 8 and backward 11 → 7 sort operands at pair scale, the
    # dominant cost of both directions (PERF.md round-4).  Values are
    # unpacked to the standard f32 buffers right after each sort, so the
    # kernels and the vjp structure are unchanged; the forward is the f32
    # forward to ~65 dB (preset measurement, PERF.md round-3).
    # -1 = auto (ON whenever compatible: fused colcap, not packed_bf16 /
    # gather_geom); 0/1 force.
    bf16_pack: int = -1
    # Sub-LSB candidate cull: drop (gaussian, tile) pairs whose max alpha in
    # the tile is < 1/510 — conservative exact quadratic-over-box test
    # (ops/binning cull_sublsb).  Pair count drives sorts + kernel grid.
    # -1 = auto (currently off pending TPU A/B + at-scale quality check);
    # 0/1 force.
    cull_sublsb: int = -1

    @property
    def tile_px(self) -> int:
        return self.tile_h * self.tile_w


@dataclasses.dataclass
class TrainConfig:
    # --- iteration counts (reference train.py:297-303) ---
    n_iters: int = 7001
    n_iters_warmup: int = 300
    n_iters_test: int = 200
    n_history_track: int = 100
    n_save_train_img: int = 100
    n_adaptive_control: int = 100
    render_downsample_start: int = 4
    render_downsample: int = 4

    # --- learning rates (train.py:314-319) ---
    lr: float = 0.003
    lr_factor_for_scale: float = 1.0
    lr_factor_for_rgb: float = 10.0
    lr_factor_for_opa: float = 10.0
    lr_factor_for_quat: float = 1.0
    lr_decay: str = "exp"                   # none | official | exp

    # --- densification / opacity reset (train.py:321-347) ---
    delete_thresh: float = 1.5
    n_opa_reset: int = 10000000
    reset_interval: int = 500
    split_thresh: float = 0.05
    grad_accum_iters: int = 50
    grad_accum_method: str = "max"          # mean | max
    grad_thresh: float = 0.0002
    use_clone: bool = False
    use_split: bool = True
    clone_dt: float = 0.01
    grad_aggregation: str = "max"           # max | mean
    adaptive_control_end_iter: int = 1000000000

    # --- losses (train.py:325-329) ---
    ssim_weight: float = 0.1
    scale_reg: float = 0.0
    opa_reg: float = 0.0

    # --- multi-chip (TPU-native addition; the reference is single-GPU) ---
    # data-parallel width: 0/1 = single device; N>1 trains over an N-device
    # jax mesh (replicated table, camera-level batch, pmean grads over ICI)
    dp: int = 0

    # --- misc ---
    seed: int = 2023
    exp: str = "default"
    data: str = "colmap_garden/"
    ckpt: Optional[str] = None
    debug: bool = False

    adam_b1: float = 0.9
    adam_b2: float = 0.99                   # reference train.py:63 betas=(0.9, 0.99)
    adam_eps: float = 1e-8

    def lr_lambda(self, group: str, i_iter: int) -> float:
        """Per-group LR multiplier, matching reference train.py:27-55.

        Groups: opa, rgb, pos, scale, quat.
        """
        w = self.n_iters_warmup
        if i_iter <= w:
            return i_iter / w
        if self.lr_decay == "none":
            return 0.2 ** ((i_iter - w) // 2000)
        gamma = 0.01 ** (1.0 / (self.n_iters - w))
        if self.lr_decay == "official":
            # only opa + pos decay (reference train.py:30-37)
            if group in ("opa", "pos"):
                return gamma ** (i_iter - w)
            return 1.0
        # "exp": every group decays (train.py:47-55)
        return gamma ** (i_iter - w)

    def group_lrs(self) -> dict:
        return {
            "opa": self.lr * self.lr_factor_for_opa,
            "rgb": self.lr * self.lr_factor_for_rgb,
            "pos": self.lr * 1.0,
            "scale": self.lr * self.lr_factor_for_scale,
            "quat": self.lr * self.lr_factor_for_quat,
        }
