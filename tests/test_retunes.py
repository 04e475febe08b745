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
