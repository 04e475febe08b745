"""Budget retune logic: pair capacity, visible rows, colcap column caps.

These are the host-side controllers that resize static specs from observed
diagnostics at densify boundaries (and immediately on overflow).  Each
retune is a recompile, so the hysteresis must be: grow promptly on
overflow, shrink only when grossly oversized, and be idempotent otherwise.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from fixtures import make_scene
from gsplat_tpu.config import SplatConfig
from gsplat_tpu.models.splatter import Splatter


@pytest.fixture(scope="module")
def splat(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    make_scene(str(d), n_points=120, n_cameras=4, w=64, h=48)
    # realistic capacity: the 4096-rounded cap logic is a no-op
    # at toy capacities
    cfg = SplatConfig(capacity_round=65536)
    return Splatter(f"{d}/sparse/0", f"{d}/images_4", cfg)


def test_retune_col_caps_sets_and_converges(splat):
    splat.cfg.plane_mode = "colcap"
    k = splat.cfg.max_tiles_per_gaussian
    fills = [30000, 18000, 9000, 3000, 1200, 300][:k] \
        + [0] * max(0, k - 6)
    assert splat.retune_col_caps(fills) is True
    caps = splat.cfg.col_caps
    assert len(caps) == k
    for f, c in zip(fills, caps):
        assert c >= f            # no immediate overflow
        assert c % 4096 == 0 or c == splat.table.capacity
    # idempotent on the same observation
    assert splat.retune_col_caps(fills) is False
    # growth when a column fill approaches its cap (fills can never exceed
    # the visible-row budget, so clamp the synthetic observation to it)
    v = splat.table.capacity
    big = [min(int(c * 1.5), v) for c in caps]
    assert splat.retune_col_caps(big) is True
    for f, c in zip(big, splat.cfg.col_caps):
        assert c >= min(f, v)


def test_retune_col_caps_engages_from_dense_ceiling(splat):
    """First tune must adopt observed targets even when every fill sits in
    the shrink-hysteresis dead zone (target*2.9 > capacity): untuned caps at
    the dense ceiling otherwise stay dense forever — the 7k garden run spent
    2300 iters at 0.3 it/s on the dense plane because of exactly this."""
    splat.cfg.plane_mode = "colcap"
    splat.cfg.col_caps = None
    splat._specs_cache.clear()
    k = splat.cfg.max_tiles_per_gaussian
    cap = splat.table.capacity
    # mid-size fills: ladder(f*1.2) < cap but ladder(f*1.2)*2.9 > cap
    fills = [int(cap * 0.45)] * k
    assert splat.retune_col_caps(fills) is True
    assert all(c < cap for c in splat.cfg.col_caps)
    assert all(c >= f for f, c in zip(fills, splat.cfg.col_caps))
    # and idempotent afterwards
    assert splat.retune_col_caps(fills) is False
    splat.cfg.col_caps = None
    splat._specs_cache.clear()


def test_bounded_k_growth():
    from gsplat_tpu.config import SplatConfig
    from gsplat_tpu.train import bounded_k_growth

    # degenerate coverage (one splat spans ~the whole grid) must not blow
    # past the 2x step / hard cap / plane-row budget bounds
    cfg = SplatConfig(max_tiles_per_gaussian=34, plane_mode="colcap",
                      col_caps=tuple([200_000] * 34))
    k = bounded_k_growth(cfg, capacity=458_752, need=1880)
    assert 34 < k <= 68
    assert sum(cfg.col_caps) + cfg.col_caps[-1] * (k - 34) \
        <= cfg.max_plane_rows
    # dense mode at large capacity: the row budget clamps growth to the
    # largest K whose dense plane still fits (458752*36 <= 16.78M)
    cfg2 = SplatConfig(max_tiles_per_gaussian=34, plane_mode="dense")
    assert bounded_k_growth(cfg2, capacity=458_752, need=1880) == 36
    # small scene: growth proceeds toward the observed need
    cfg3 = SplatConfig(max_tiles_per_gaussian=6, plane_mode="dense")
    assert bounded_k_growth(cfg3, capacity=4096, need=10) == 10
    # hard cap wins even when rows are affordable
    cfg4 = SplatConfig(max_tiles_per_gaussian=62, plane_mode="colcap",
                       col_caps=tuple([4096] * 62))
    assert bounded_k_growth(cfg4, capacity=458_752, need=500) == 64


def test_retune_col_caps_noop_in_dense_mode(splat):
    splat.cfg.plane_mode = "dense"
    assert splat.retune_col_caps([10000] * 6) is False
    splat.cfg.plane_mode = "colcap"


def test_retune_col_caps_handles_k_growth(splat):
    splat.cfg.plane_mode = "colcap"
    splat.retune_col_caps(
        [20000] * splat.cfg.max_tiles_per_gaussian)
    old_k = splat.cfg.max_tiles_per_gaussian
    splat.cfg.max_tiles_per_gaussian = old_k + 2
    try:
        # caps shorter than K must be padded, not crash
        bspec, _ = splat.specs()
        assert len(bspec.col_caps) == old_k + 2
    finally:
        splat.cfg.max_tiles_per_gaussian = old_k
        splat._specs_cache.clear()


def test_retune_pair_capacity_hysteresis(splat):
    changed = splat.retune_pair_capacity(5000)
    # second call with the same observation: stable
    assert splat.retune_pair_capacity(5000) is False or changed
    bspec, _ = splat.specs()
    g = splat.cfg.chunk_size
    floor = bspec.n_tiles * g
    extra = bspec.slot_capacity - floor
    assert extra >= 5000 * 1.2


def test_retune_visible_rows_bounds(splat):
    splat.cfg.visible_rows = None
    splat.retune_visible_rows(100)
    v = splat.cfg.visible_rows
    assert v is None or v >= 110  # margin over observation


def test_retune_pair_capacity_legacy_floor_accounting(splat):
    """The legacy route's n_slots_used signal (nc_used*G) counts the
    mandatory one-chunk-per-tile floor; the controller must subtract it
    before comparing against the pairs-only budget, or it permanently
    over-provisions by ~1.35x the floor."""
    old_fused = splat.cfg.fused_pack
    old_pc = splat.cfg.pair_capacity
    try:
        splat.cfg.fused_pack = False
        splat.cfg.pair_capacity = None     # untuned: generous initial guess
        splat._specs_cache.clear()
        bspec, _ = splat.specs()
        g = splat.cfg.chunk_size
        floor = bspec.n_tiles * g
        # observed requirement: the floor plus a small real-pairs tail
        splat.retune_pair_capacity(floor + 2000)
        pc = splat.cfg.pair_capacity
        assert pc is not None
        # budget must track the 2000 real pairs (x1.35 margin, ladder-
        # rounded), NOT floor + 2000 (the bug inflated it by the floor)
        assert pc == splat._ladder(2000 * 1.35), (pc, floor)
    finally:
        splat.cfg.fused_pack = old_fused
        splat.cfg.pair_capacity = old_pc
        splat._specs_cache.clear()


def test_px_split_must_divide_tile_pixels(splat):
    """px_split values that don't divide the tile pixel count would
    silently drop the remainder pixel lanes — must be rejected early."""
    old = getattr(splat.cfg, "px_split", 1)
    try:
        splat.cfg.px_split = 3       # 256 % 3 != 0
        splat._specs_cache.clear()
        with pytest.raises(ValueError, match="px_split"):
            splat.specs()
    finally:
        splat.cfg.px_split = old
        splat._specs_cache.clear()
