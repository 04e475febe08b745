"""Fused sorted packing (gather-free fast path) vs the legacy gather route.

The fast path (ops/binning.pack_sorted) must be numerically identical to
bin_gaussians + pack_pairs end to end — forward images AND gradients w.r.t.
every differentiable input — since both feed the same rasterizer kernels.
Covers RGB and SH, multi-chunk tiles, geometry gradients through the packed
columns, empty tiles, and chunk-budget truncation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gsplat_tpu.ops.binning import (bin_gaussians, pack_pairs, pack_sorted)
from gsplat_tpu.ops.rasterize import rasterize

from helpers import image_space_scene


def _geom_n(proj, opa):
    n = opa.shape[0]
    return jnp.concatenate(
        [proj.mean2d, proj.cov2d, opa[:, None],
         jnp.zeros((n, 1), jnp.float32)], axis=1)


def _render_legacy(proj, opa, color, bspec, rspec, **kw):
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color,
                        k_width=bspec.max_tiles_per_gaussian)
    return rasterize(packed, binned, rspec, **kw), binned


def _render_fused(proj, opa, color, bspec, rspec, **kw):
    packed, meta = pack_sorted(bspec, _geom_n(proj, opa), color,
                               proj.depth, proj.visible)
    rspec = rspec._replace(channel_major=True)  # pack_sorted emits (8, S)
    return rasterize(packed, meta, rspec, **kw), meta


@pytest.mark.slow
def test_fused_matches_legacy_fwd_and_diag(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    a, binned = _render_legacy(proj, opa, color, bspec, rspec,
                               use_pallas=True, interpret=True)
    b, meta = _render_fused(proj, opa, color, bspec, rspec,
                            use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for f in ("n_pairs", "n_clipped", "n_max_tiles", "n_visible",
              "n_vis_dropped", "n_dropped"):
        assert int(getattr(binned, f)) == int(getattr(meta, f)), f


@pytest.mark.slow
def test_fused_full_input_grads_match(rng):
    """Gradients w.r.t. mean2d, cov2d, opa and color all match legacy."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=120)
    tgt = jnp.asarray(
        np.random.default_rng(7).uniform(
            0, 1, (3, rspec.padded_h, rspec.padded_w)), jnp.float32)

    def loss_legacy(mean2d, cov2d, opa_, color_):
        p = proj._replace(mean2d=mean2d, cov2d=cov2d)
        img, _ = _render_legacy(p, opa_, color_, bspec, rspec,
                                use_pallas=True, interpret=True)
        return jnp.mean((img - tgt) ** 2)

    def loss_fused(mean2d, cov2d, opa_, color_):
        p = proj._replace(mean2d=mean2d, cov2d=cov2d)
        img, _ = _render_fused(p, opa_, color_, bspec, rspec,
                               use_pallas=True, interpret=True)
        return jnp.mean((img - tgt) ** 2)

    args = (proj.mean2d, proj.cov2d, opa, color)
    g1 = jax.grad(loss_legacy, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g1, g2, ("mean2d", "cov2d", "opa", "color")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=name)


@pytest.mark.slow
def test_fused_multichunk_and_jnp_compositor(rng):
    """Dense multi-chunk scene; fused buffers feed both compositors."""
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=1500, sigma_px=(4.0, 18.0))
    opa = opa * 0.5
    a, _ = _render_legacy(proj, opa, color, bspec, rspec,
                          use_pallas=True, interpret=True)
    b, meta = _render_fused(proj, opa, color, bspec, rspec,
                            use_pallas=True, interpret=True)
    c, _ = _render_fused(proj, opa, color, bspec, rspec, use_pallas=False)
    n_chunks_used = int((np.asarray(meta.chunk_tile) < rspec.n_tiles).sum())
    assert n_chunks_used > 5 * rspec.n_tiles, "scene must be multi-chunk"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-5)


@pytest.mark.slow
def test_fused_sh_grads_match(rng):
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=100, color_dim=27)
    shv = jnp.asarray(np.random.default_rng(3).normal(0, 0.3, (4, 3)),
                      jnp.float32)

    def loss(render):
        def f(opa_, color_):
            img, _ = render(proj, opa_, color_, bspec, rspec,
                            sh_vecs=shv, use_pallas=True, interpret=True)
            return jnp.sum(img ** 2)
        return f

    v1, g1 = jax.value_and_grad(loss(_render_legacy), argnums=(0, 1))(
        opa, color)
    v2, g2 = jax.value_and_grad(loss(_render_fused), argnums=(0, 1))(
        opa, color)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_fused_truncation_fail_safe(rng):
    """Chunk-budget overflow on the fused path: truncated tiles go black."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80)
    small = bspec._replace(slot_capacity=3 * bspec.chunk_size)
    img, meta = _render_fused(proj, opa, color, small, rspec,
                              use_pallas=True, interpret=True)
    assert int(meta.n_dropped) > 0
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    tile_ok = np.asarray(meta.tile_ok)
    th, tw = rspec.tile_h, rspec.tile_w
    ref, _ = _render_fused(proj, opa, color, bspec, rspec,
                           use_pallas=True, interpret=True)
    refarr = np.asarray(ref)
    for t in range(rspec.n_tiles):
        ty, tx = divmod(t, rspec.n_tile_x)
        blk = arr[:, ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
        if tile_ok[t]:
            np.testing.assert_allclose(
                blk,
                refarr[:, ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw],
                atol=1e-5)
        else:
            np.testing.assert_array_equal(blk, 0.0)

    def loss(opa_, color_):
        img2, _ = _render_fused(proj, opa_, color_, small, rspec,
                                use_pallas=True, interpret=True)
        return jnp.sum(img2)

    g = jax.grad(loss, argnums=(0, 1))(opa, color)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()


def test_fused_all_invisible(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    proj = proj._replace(visible=jnp.zeros_like(proj.visible))
    img, meta = _render_fused(proj, opa, color, bspec, rspec,
                              use_pallas=True, interpret=True)
    assert int(meta.n_pairs) == 0
    np.testing.assert_array_equal(np.asarray(img), 0.0)


# ---------------------------------------------------------------------------
# column-compacted candidate plane (plane_mode="colcap")
# ---------------------------------------------------------------------------

def _colcap_spec(bspec, caps=None):
    k = bspec.max_tiles_per_gaussian
    return bspec._replace(plane_mode="colcap",
                          col_caps=tuple(caps) if caps else ())


def test_colcap_matches_dense_fwd(rng):
    """Coverage-prefix column slicing is exactly the dense plane (the
    composite (tile, depth-rank) key restores the same total order)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec = rspec._replace(channel_major=True)
    a, meta_d = pack_sorted(bspec, _geom_n(proj, opa), color,
                            proj.depth, proj.visible)
    b, meta_c = pack_sorted(_colcap_spec(bspec), _geom_n(proj, opa), color,
                            proj.depth, proj.visible)
    img_a = rasterize(a, meta_d, rspec, use_pallas=True, interpret=True)
    img_b = rasterize(b, meta_c, rspec, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-6)
    assert int(meta_d.n_pairs) == int(meta_c.n_pairs)
    assert int(meta_c.n_plane_clipped) == 0
    fills = np.asarray(meta_c.col_fill)
    assert fills[0] >= fills[-1] >= 0 and fills.sum() == int(meta_c.n_pairs)


@pytest.mark.slow
def test_colcap_tight_caps_grads_match_dense(rng):
    """With caps >= fills, colcap gradients equal dense gradients."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=120)
    rspec = rspec._replace(channel_major=True)
    # observe fills, then cap tightly (no margin) — still lossless
    _, meta = pack_sorted(_colcap_spec(bspec), _geom_n(proj, opa), color,
                          proj.depth, proj.visible)
    caps = [max(int(x), 1) for x in np.asarray(meta.col_fill)]
    spec_c = _colcap_spec(bspec, caps)

    def loss(spec):
        def f(mean2d, cov2d, opa_, color_):
            p = proj._replace(mean2d=mean2d, cov2d=cov2d)
            pk, mt = pack_sorted(spec, _geom_n(p, opa_), color_,
                                 p.depth, p.visible)
            img = rasterize(pk, mt, rspec, use_pallas=True, interpret=True)
            return jnp.sum(img ** 2)
        return f

    args = (proj.mean2d, proj.cov2d, opa, color)
    g1 = jax.grad(loss(bspec), argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss(spec_c), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g1, g2, ("mean2d", "cov2d", "opa", "color")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=name)


@pytest.mark.slow
def test_colcap_cap_overflow_fail_safe(rng):
    """Column caps too small: deepest rows' pairs drop, diagnosed, finite."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec = rspec._replace(channel_major=True)
    k = bspec.max_tiles_per_gaussian
    spec_c = _colcap_spec(bspec, [8] * k)   # far below real fills
    pk, meta = pack_sorted(spec_c, _geom_n(proj, opa), color,
                           proj.depth, proj.visible)
    assert int(meta.n_plane_clipped) > 0
    img = rasterize(pk, meta, rspec, use_pallas=True, interpret=True)
    assert np.isfinite(np.asarray(img)).all()

    def loss(opa_):
        pk2, mt = pack_sorted(spec_c, _geom_n(proj, opa_), color,
                              proj.depth, proj.visible)
        return jnp.sum(rasterize(pk2, mt, rspec, use_pallas=True,
                                 interpret=True))

    g = jax.grad(loss)(opa)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_colcap_sh_matches_dense(rng):
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=90, color_dim=27)
    rspec = rspec._replace(channel_major=True)
    shv = jnp.asarray(np.random.default_rng(5).normal(0, 0.3, (4, 3)),
                      jnp.float32)
    a, md = pack_sorted(bspec, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mc = pack_sorted(_colcap_spec(bspec), _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    img_a = rasterize(a, md, rspec, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    img_b = rasterize(b, mc, rspec, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-6)


@pytest.mark.slow
def test_packed_bf16_render_close_to_f32(rng):
    """The bf16-packed render preset: small image error vs the f32 path.

    Positions are tile-relative so bf16 keeps ~0.2 px accuracy; colors and
    covariances carry ~0.4% relative error.  The preset is render-only
    (backward raises)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=200)
    rspec = rspec._replace(channel_major=True)
    spec_f = _colcap_spec(bspec)
    spec_p = spec_f._replace(packed_bf16=True)
    rspec_p = rspec._replace(packed_bf16=True)
    a, ma = pack_sorted(spec_f, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(spec_p, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    assert b[0].dtype == jnp.int32 and b[0].shape[0] == 4
    img_f = rasterize(a, ma, rspec, use_pallas=True, interpret=True)
    img_p = rasterize(b, mb, rspec_p, use_pallas=True, interpret=True)
    f, p = np.asarray(img_f), np.asarray(img_p)
    mse = float(((f - p) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40, psnr     # visually indistinguishable
    # jnp compositor agrees with the pallas path on packed buffers too
    img_j = rasterize(b, mb, rspec_p, use_pallas=False)
    np.testing.assert_allclose(p, np.asarray(img_j), atol=1e-5)

    # backward is explicitly unsupported
    def loss(opa_):
        pk, mt = pack_sorted(spec_p, _geom_n(proj, opa_), color,
                             proj.depth, proj.visible)
        return jnp.sum(rasterize(pk, mt, rspec_p, use_pallas=True,
                                 interpret=True))

    with pytest.raises(NotImplementedError):
        jax.grad(loss)(opa)


def test_packed_bf16_sh_render(rng):
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=80, color_dim=27)
    rspec = rspec._replace(channel_major=True)
    shv = jnp.asarray(np.random.default_rng(9).normal(0, 0.3, (4, 3)),
                      jnp.float32)
    spec_p = _colcap_spec(bspec)._replace(packed_bf16=True)
    rspec_p = rspec._replace(packed_bf16=True)
    a, ma = pack_sorted(_colcap_spec(bspec), _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(spec_p, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    assert b[1].shape[0] == 16      # 27→32 padded SH channels → 16 rows
    img_f = rasterize(a, ma, rspec, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    img_p = rasterize(b, mb, rspec_p, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    f, p = np.asarray(img_f), np.asarray(img_p)
    mse = float(((f - p) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 38, psnr


@pytest.mark.parametrize("color_dim", [3, 27])
def test_post_align_bitwise_matches_padded_sort(rng, color_dim):
    """post_align (no-pad sort + in-kernel realign) == padded-sort preset.

    Both routes place the same candidates in the same stable (tile,
    depth-rank, plane) order and mask dead lanes by chunk_len, so the
    chunk metadata and the rendered images must match BITWISE — on the
    pallas kernel path (two-window roll/select realign, chunk_size == 128
    scenes) and on the jnp compositor path (XLA realign adapter)."""
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=150, color_dim=color_dim)
    rspec_p = rspec._replace(channel_major=True, packed_bf16=True)
    spec_p = _colcap_spec(bspec)._replace(packed_bf16=True)
    spec_a = spec_p._replace(post_align=True)
    a, ma = pack_sorted(spec_p, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(spec_a, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    for f_ in ("chunk_tile", "chunk_first", "chunk_last", "chunk_len",
               "tile_ok", "n_pairs", "n_dropped", "n_chunks_used"):
        np.testing.assert_array_equal(np.asarray(getattr(ma, f_)),
                                      np.asarray(getattr(mb, f_)), err_msg=f_)
    assert int(mb.n_pad_used) == 0 and int(mb.n_pad_dropped) == 0
    assert mb.chunk_src is not None and ma.chunk_src is None
    shv = (jnp.asarray(np.random.default_rng(9).normal(0, 0.3, (4, 3)),
                       jnp.float32) if color_dim == 27 else None)
    img_a = rasterize(a, ma, rspec_p, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    if spec_p.chunk_size == 128:
        rspec_a = rspec_p._replace(post_align=True)
        img_b = rasterize(b, mb, rspec_a, sh_vecs=shv, use_pallas=True,
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    # jnp compositor path: the XLA realign adapter feeds the oracle
    img_j = rasterize(b, mb, rspec_p._replace(post_align=True),
                      sh_vecs=shv, use_pallas=False)
    img_aj = rasterize(a, ma, rspec_p, sh_vecs=shv, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(img_aj), np.asarray(img_j))


def test_post_align_requires_packed_bf16(rng):
    """Train routes must reject post_align: the padded sort is their
    gradient-alignment contract (realigned slots are not a permutation of
    the candidate ranks the backward's slice-reduction assumes)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    spec_bad = _colcap_spec(bspec)._replace(post_align=True)
    with pytest.raises(ValueError, match="post_align"):
        pack_sorted(spec_bad, _geom_n(proj, opa), color,
                    proj.depth, proj.visible)


# ---------------------------------------------------------------------------
# gather_colors: wide-color fast path (colors move by one post-sort gather
# instead of riding the payload sort — the SH sort keeps RGB's 9 operands)
# ---------------------------------------------------------------------------

def _gather_spec(bspec, caps=None):
    return _colcap_spec(bspec, caps)._replace(gather_colors=True)


def test_gather_colors_sh_matches_dense(rng):
    """SH forward via gathered row-major colors == dense-plane route."""
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=90, color_dim=27)
    rspec_cm = rspec._replace(channel_major=True)
    rspec_g = rspec_cm._replace(color_row_major=True)
    shv = jnp.asarray(np.random.default_rng(5).normal(0, 0.3, (4, 3)),
                      jnp.float32)
    a, md = pack_sorted(bspec, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mg = pack_sorted(_gather_spec(bspec), _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    assert b[1].shape == (bspec.num_slots, 32)   # ROW-major, 27→32 padded
    img_a = rasterize(a, md, rspec_cm, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    img_b = rasterize(b, mg, rspec_g, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-6)
    # jnp compositor consumes the row-major color block too
    img_j = rasterize(b, mg, rspec_g, sh_vecs=shv, use_pallas=False)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_j),
                               atol=1e-5)


@pytest.mark.slow
def test_gather_colors_full_grads_match(rng):
    """All input gradients through the gather route == dense route, with
    tight column caps exercising the v_rows < V gathered-window cut."""
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=120, color_dim=27)
    rspec_cm = rspec._replace(channel_major=True)
    rspec_g = rspec_cm._replace(color_row_major=True)
    shv = jnp.asarray(np.random.default_rng(11).normal(0, 0.3, (4, 3)),
                      jnp.float32)
    _, meta = pack_sorted(_colcap_spec(bspec), _geom_n(proj, opa), color,
                          proj.depth, proj.visible)
    caps = [max(int(x), 1) for x in np.asarray(meta.col_fill)]

    def loss(spec, rs):
        def f(mean2d, cov2d, opa_, color_):
            p = proj._replace(mean2d=mean2d, cov2d=cov2d)
            pk, mt = pack_sorted(spec, _geom_n(p, opa_), color_,
                                 p.depth, p.visible)
            img = rasterize(pk, mt, rs, sh_vecs=shv, use_pallas=True,
                            interpret=True)
            return jnp.sum(img ** 2)
        return f

    args = (proj.mean2d, proj.cov2d, opa, color)
    g1 = jax.grad(loss(bspec, rspec_cm), argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss(_gather_spec(bspec, caps), rspec_g),
                  argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g1, g2, ("mean2d", "cov2d", "opa", "color")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=name)


@pytest.mark.slow
def test_gather_colors_rgb_matches_legacy(rng):
    """gather_colors forced on for RGB (not the default) still matches."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec_g = rspec._replace(channel_major=True, color_row_major=True)
    a, _ = _render_legacy(proj, opa, color, bspec, rspec,
                          use_pallas=True, interpret=True)
    pk, mg = pack_sorted(_gather_spec(bspec), _geom_n(proj, opa), color,
                         proj.depth, proj.visible)
    b = rasterize(pk, mg, rspec_g, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(opa_, color_):
        pk2, mt = pack_sorted(_gather_spec(bspec), _geom_n(proj, opa_),
                              color_, proj.depth, proj.visible)
        img = rasterize(pk2, mt, rspec_g, use_pallas=True, interpret=True)
        return jnp.sum(img ** 2)

    def loss_legacy(opa_, color_):
        img, _ = _render_legacy(proj, opa_, color_, bspec, rspec,
                                use_pallas=True, interpret=True)
        return jnp.sum(img ** 2)

    g1 = jax.grad(loss_legacy, argnums=(0, 1))(opa, color)
    g2 = jax.grad(loss, argnums=(0, 1))(opa, color)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_gather_colors_truncation_finite(rng):
    """Slot-budget overflow through the gather route: finite image and
    gradients (dropped candidates' color cotangents read the zero row)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80)
    rspec_g = rspec._replace(channel_major=True, color_row_major=True)
    small = _gather_spec(bspec)._replace(
        slot_capacity=3 * bspec.chunk_size)
    pk, meta = pack_sorted(small, _geom_n(proj, opa), color,
                           proj.depth, proj.visible)
    assert int(meta.n_dropped) > 0
    img = rasterize(pk, meta, rspec_g, use_pallas=True, interpret=True)
    assert np.isfinite(np.asarray(img)).all()

    def loss(opa_, color_):
        pk2, mt = pack_sorted(small, _geom_n(proj, opa_), color_,
                              proj.depth, proj.visible)
        return jnp.sum(rasterize(pk2, mt, rspec_g, use_pallas=True,
                                 interpret=True))

    g = jax.grad(loss, argnums=(0, 1))(opa, color)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()


# ---------------------------------------------------------------------------
# gather_geom: full gather route (payload sort carries only key+flat; BOTH
# geometry and colors move by post-sort row gathers)
# ---------------------------------------------------------------------------

def _gather_geom_spec(bspec, caps=None):
    return _colcap_spec(bspec, caps)._replace(gather_colors=True,
                                              gather_geom=True)


def test_gather_geom_matches_legacy_rgb(rng):
    """Full gather route forward == legacy route, both raster backends."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec_g = rspec._replace(channel_major=True, color_row_major=True,
                             geom_row_major=True)
    a, _ = _render_legacy(proj, opa, color, bspec, rspec,
                          use_pallas=True, interpret=True)
    pk, mg = pack_sorted(_gather_geom_spec(bspec), _geom_n(proj, opa),
                         color, proj.depth, proj.visible)
    assert pk[0].shape == (bspec.num_slots, 8)   # geometry ROW-major
    b = rasterize(pk, mg, rspec_g, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    j = rasterize(pk, mg, rspec_g, use_pallas=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(j), atol=1e-5)


@pytest.mark.slow
def test_gather_geom_full_grads_match(rng):
    """All input gradients through the full gather route == dense route,
    with tight column caps exercising the v_rows < V gathered window."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=120)
    rspec_cm = rspec._replace(channel_major=True)
    rspec_g = rspec_cm._replace(color_row_major=True, geom_row_major=True)
    _, meta = pack_sorted(_colcap_spec(bspec), _geom_n(proj, opa), color,
                          proj.depth, proj.visible)
    caps = [max(int(x), 1) for x in np.asarray(meta.col_fill)]

    def loss(spec, rs):
        def f(mean2d, cov2d, opa_, color_):
            p = proj._replace(mean2d=mean2d, cov2d=cov2d)
            pk, mt = pack_sorted(spec, _geom_n(p, opa_), color_,
                                 p.depth, p.visible)
            img = rasterize(pk, mt, rs, use_pallas=True, interpret=True)
            return jnp.sum(img ** 2)
        return f

    args = (proj.mean2d, proj.cov2d, opa, color)
    g1 = jax.grad(loss(bspec, rspec_cm), argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss(_gather_geom_spec(bspec, caps), rspec_g),
                  argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g1, g2, ("mean2d", "cov2d", "opa", "color")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=name)


@pytest.mark.slow
def test_gather_geom_sh_matches_dense(rng):
    """SH through the full gather route (2-operand sort) == dense route,
    forward and gradients."""
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=90, color_dim=27)
    rspec_cm = rspec._replace(channel_major=True)
    rspec_g = rspec_cm._replace(color_row_major=True, geom_row_major=True)
    shv = jnp.asarray(np.random.default_rng(5).normal(0, 0.3, (4, 3)),
                      jnp.float32)
    a, md = pack_sorted(bspec, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mg = pack_sorted(_gather_geom_spec(bspec), _geom_n(proj, opa),
                        color, proj.depth, proj.visible)
    img_a = rasterize(a, md, rspec_cm, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    img_b = rasterize(b, mg, rspec_g, sh_vecs=shv, use_pallas=True,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-6)

    def loss(spec, rs):
        def f(opa_, color_):
            pk, mt = pack_sorted(spec, _geom_n(proj, opa_), color_,
                                 proj.depth, proj.visible)
            img = rasterize(pk, mt, rs, sh_vecs=shv, use_pallas=True,
                            interpret=True)
            return jnp.sum(img ** 2)
        return f

    g1 = jax.grad(loss(bspec, rspec_cm), argnums=(0, 1))(opa, color)
    g2 = jax.grad(loss(_gather_geom_spec(bspec), rspec_g),
                  argnums=(0, 1))(opa, color)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_gather_geom_truncation_finite(rng):
    """Slot-budget overflow through the full gather route stays finite."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80)
    rspec_g = rspec._replace(channel_major=True, color_row_major=True,
                             geom_row_major=True)
    small = _gather_geom_spec(bspec)._replace(
        slot_capacity=3 * bspec.chunk_size)
    pk, meta = pack_sorted(small, _geom_n(proj, opa), color,
                           proj.depth, proj.visible)
    assert int(meta.n_dropped) > 0
    img = rasterize(pk, meta, rspec_g, use_pallas=True, interpret=True)
    assert np.isfinite(np.asarray(img)).all()

    def loss(opa_, color_):
        pk2, mt = pack_sorted(small, _geom_n(proj, opa_), color_,
                              proj.depth, proj.visible)
        return jnp.sum(rasterize(pk2, mt, rspec_g, use_pallas=True,
                                 interpret=True))

    g = jax.grad(loss, argnums=(0, 1))(opa, color)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()


# ---------------------------------------------------------------------------
# cull_sublsb: sub-LSB pair cull (exact conservative quadratic-over-box min)
# ---------------------------------------------------------------------------

def test_q_min_box_matches_bruteforce(rng):
    """Closed-form box minimum of the kernel exponent == dense-grid min."""
    from gsplat_tpu.ops.binning import _q_min_box
    r = np.random.default_rng(3)
    for _ in range(50):
        # random PSD covariance (a, b, c, d) with b == c
        m_ = r.normal(0, 1, (2, 2))
        cov = m_ @ m_.T + 0.05 * np.eye(2)
        a, b, c, d = cov[0, 0], cov[0, 1], cov[1, 0], cov[1, 1]
        lx, ly = r.uniform(-3, 1, 2)
        ux, uy = lx + r.uniform(0.1, 3), ly + r.uniform(0.1, 3)
        got = float(_q_min_box(*[jnp.float32(v) for v in (a, b, c, d)],
                               jnp.float32(lx), jnp.float32(ux),
                               jnp.float32(ly), jnp.float32(uy)))
        gx = np.linspace(lx, ux, 201)
        gy = np.linspace(ly, uy, 201)
        dx, dy = np.meshgrid(gx, gy)
        q = d * dx ** 2 - (b + c) * dx * dy + a * dy ** 2
        ref = float(q.min())
        # closed form is exact; the grid only samples, so it can only
        # OVERestimate the true min
        assert got <= ref + 1e-4, (got, ref)
        assert got >= ref - 0.15 * max(ref, 1.0), (got, ref)


def test_cull_sublsb_subvisible_only(rng):
    """The cull drops pairs (n_pairs strictly falls on a scene with low-opa
    and elongated gaussians) and the image moves by less than an 8-bit LSB
    anywhere — the culled pairs were sub-visible by construction."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=200)
    # push a third of the gaussians to near-reset opacity: their footprint
    # shrinks a lot under the opacity-aware iso level
    opa = jnp.asarray(np.where(np.arange(200) % 3 == 0, 0.008,
                               np.asarray(opa)), jnp.float32)
    rspec_cm = rspec._replace(channel_major=True)
    base = _colcap_spec(bspec)
    culled = base._replace(cull_sublsb=True)
    a, ma = pack_sorted(base, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(culled, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    assert int(mb.n_pairs) < int(ma.n_pairs), \
        (int(mb.n_pairs), int(ma.n_pairs))
    img_a = rasterize(a, ma, rspec_cm, use_pallas=True, interpret=True)
    img_b = rasterize(b, mb, rspec_cm, use_pallas=True, interpret=True)
    diff = np.abs(np.asarray(img_a) - np.asarray(img_b))
    # each culled pair contributes < 1/510 per pixel; a handful can stack,
    # but staying within one LSB of 8-bit means render-indistinguishable
    assert diff.max() < 1.0 / 255.0, diff.max()


@pytest.mark.slow
def test_cull_sublsb_grads_finite_and_close(rng):
    """Training through the cull: gradients stay finite and match the
    uncalled route to sub-LSB scale."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=120)
    rspec_cm = rspec._replace(channel_major=True)

    def loss(spec):
        def f(opa_, color_):
            pk, mt = pack_sorted(spec, _geom_n(proj, opa_), color_,
                                 proj.depth, proj.visible)
            img = rasterize(pk, mt, rspec_cm, use_pallas=True,
                            interpret=True)
            return jnp.mean(img ** 2)
        return f

    g1 = jax.grad(loss(_colcap_spec(bspec)), argnums=(0, 1))(opa, color)
    g2 = jax.grad(loss(_colcap_spec(bspec)._replace(cull_sublsb=True)),
                  argnums=(0, 1))(opa, color)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=0.05)


@pytest.mark.slow
def test_cull_sublsb_with_gather_geom(rng):
    """The cull composes with the full gather route (the A/B's combined
    variant): sub-LSB image delta vs the unculled gather render, finite
    matching grads, and pairs strictly fall."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    opa = jnp.asarray(np.where(np.arange(150) % 3 == 0, 0.008,
                               np.asarray(opa)), jnp.float32)
    rspec_g = rspec._replace(channel_major=True, color_row_major=True,
                             geom_row_major=True)
    base = _gather_geom_spec(bspec)
    culled = base._replace(cull_sublsb=True)
    a, ma = pack_sorted(base, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(culled, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    assert int(mb.n_pairs) < int(ma.n_pairs)
    img_a = rasterize(a, ma, rspec_g, use_pallas=True, interpret=True)
    img_b = rasterize(b, mb, rspec_g, use_pallas=True, interpret=True)
    assert np.abs(np.asarray(img_a) - np.asarray(img_b)).max() < 1.0 / 255.0

    def loss(spec):
        def f(opa_, color_):
            pk, mt = pack_sorted(spec, _geom_n(proj, opa_), color_,
                                 proj.depth, proj.visible)
            return jnp.mean(rasterize(pk, mt, rspec_g, use_pallas=True,
                                      interpret=True) ** 2)
        return f

    g1 = jax.grad(loss(base), argnums=(0, 1))(opa, color)
    g2 = jax.grad(loss(culled), argnums=(0, 1))(opa, color)
    for ga, gb in zip(g1, g2):
        assert np.isfinite(np.asarray(gb)).all()
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=5e-3, rtol=0.05)


@pytest.mark.slow
def test_px_split_identical(rng):
    """Sub-tile early stop (px_split=2) must not change the image beyond
    ulp-level fusion reassociation: the per-half gates only skip work whose
    contributions are fully masked (transmittance below STOP_THRESH is
    monotone)."""
    # opa_max high + many gaussians → deep tiles that actually saturate
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=300,
                                                       opa_max=0.999)
    a, _ = _render_fused(proj, opa, color, bspec, rspec,
                         use_pallas=True, interpret=True)
    b, _ = _render_fused(proj, opa, color, bspec,
                         rspec._replace(px_split=2),
                         use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_px_split_sh(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80,
                                                       color_dim=27)
    rspec = rspec._replace(color_dim=27)
    shv = jnp.asarray(np.random.default_rng(5).normal(0, 0.3, (4, 3)),
                      jnp.float32)
    a, _ = _render_fused(proj, opa, color, bspec, rspec, sh_vecs=shv,
                         use_pallas=True, interpret=True)
    b, _ = _render_fused(proj, opa, color, bspec,
                         rspec._replace(px_split=2), sh_vecs=shv,
                         use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_px_split_grads_match(rng):
    """Backward sub-tile gating must reproduce the ungated gradients
    (tolerances allow half-width reduction-tree reassociation: both modes
    sit ~2e-4 from the jnp oracle on this scene, and each other within
    the same band)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=200,
                                                       opa_max=0.999)

    def loss(rs):
        def f(opa_, color_):
            img, _ = _render_fused(proj, opa_, color_, bspec, rs,
                                   use_pallas=True, interpret=True)
            return jnp.sum(img ** 2 * jnp.cos(img))
        return f

    g1 = jax.grad(loss(rspec), argnums=(0, 1))(opa, color)
    g2 = jax.grad(loss(rspec._replace(px_split=2)), argnums=(0, 1))(
        opa, color)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)


@pytest.mark.slow
def test_cull_sublsb_keeps_degenerate_covs_dist_method(rng):
    """Under method="dist" (whose bbox stage skips the det check) a det<=0
    covariance makes the iso test unsatisfiable (pn < 0); the conservative
    contract requires KEEPING such pairs — the rasterizer still draws them
    via _chunk_alpha's clamp."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=60)
    cov = np.array(proj.cov2d)
    cov[:, 3] = -0.5 * cov[:, 0]          # d = -a/2  ->  det < 0 everywhere
    proj = proj._replace(cov2d=jnp.asarray(cov))
    base = _colcap_spec(bspec)._replace(
        method="dist", thresh=(3.0 * bspec.tile_len_x) ** 2)
    culled = base._replace(cull_sublsb=True)
    _, ma = pack_sorted(base, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    _, mb = pack_sorted(culled, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    assert int(ma.n_pairs) > 0
    assert int(mb.n_pairs) == int(ma.n_pairs)


def test_gather_geom_single_sort(rng):
    """The full gather route must trace exactly ONE lax.sort in the forward
    (the stable (key, flat) sort — metadata keys and slot map both come from
    it) and one more in the backward (the flat→slot inversion).  Sorts are
    the dominant pack cost; a regression to the padded two-sort structure
    would re-inflate every operand by T*(G-1) pad rows."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80)
    spec = _gather_geom_spec(bspec)
    n_rows = proj.depth.shape[0]

    def pair_sorts(jaxpr):
        # sorts whose operands are LARGER than row scale (N): pack sorts
        # (row-scale depth/coverage argsorts are not the cost driver)
        n = 0
        for eq in jaxpr.eqns:
            if (eq.primitive.name == "sort"
                    and eq.invars[0].aval.shape[0] > n_rows):
                n += 1
            for v in eq.params.values():
                if hasattr(v, "jaxpr"):
                    n += pair_sorts(v.jaxpr)
        return n

    fwd = jax.make_jaxpr(
        lambda g, c: pack_sorted(spec, g, c, proj.depth, proj.visible))(
            _geom_n(proj, opa), color)
    assert pair_sorts(fwd.jaxpr) == 1, fwd.jaxpr

    def loss(g, c):
        pk, meta = pack_sorted(spec, g, c, proj.depth, proj.visible)
        return jnp.sum(pk[0]) + jnp.sum(pk[1])

    both = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(
        _geom_n(proj, opa), color)
    assert pair_sorts(both.jaxpr) == 2, both.jaxpr  # fwd 1 + bwd 1


def _bf16_pack_spec(bspec, **kw):
    return _colcap_spec(bspec)._replace(bf16_pack=True, **kw)


def test_bf16_pack_close_to_f32_fwd_and_grads(rng):
    """Train-capable packed payloads: forward ~bf16-exact vs f32, grads
    close (the backward also rides packed cotangents), positions exact.

    Position payloads stay f32, so the unpacked x/y columns must be
    BIT-exact; cov/opa/color round-trip through bf16 (~0.4% relative)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec = rspec._replace(channel_major=True)
    spec_f = _colcap_spec(bspec)
    spec_p = _bf16_pack_spec(bspec)
    a, ma = pack_sorted(spec_f, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(spec_p, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    # same buffer contract as the f32 route: f32 channel-major (8, S)/(8, S)
    assert b[0].dtype == jnp.float32 and b[0].shape == a[0].shape
    assert b[1].dtype == jnp.float32 and b[1].shape == a[1].shape
    np.testing.assert_array_equal(np.asarray(a[0][:2]),
                                  np.asarray(b[0][:2]))  # x, y exact
    img_f = rasterize(a, ma, rspec, use_pallas=True, interpret=True)
    img_p = rasterize(b, mb, rspec, use_pallas=True, interpret=True)
    f, p = np.asarray(img_f), np.asarray(img_p)
    mse = float(((f - p) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40, psnr
    for fld in ("n_pairs", "n_clipped", "n_visible", "n_chunks_used"):
        assert int(getattr(ma, fld)) == int(getattr(mb, fld)), fld

    tgt = jnp.asarray(np.random.default_rng(7).uniform(
        0, 1, (3, rspec.padded_h, rspec.padded_w)), jnp.float32)

    def loss(spec):
        def f(mean2d, cov2d, opa_, color_):
            p_ = proj._replace(mean2d=mean2d, cov2d=cov2d)
            pk, mt = pack_sorted(spec, _geom_n(p_, opa_), color_,
                                 p_.depth, p_.visible)
            img = rasterize(pk, mt, rspec, use_pallas=True, interpret=True)
            return jnp.mean((img - tgt) ** 2)
        return f

    args = (proj.mean2d, proj.cov2d, opa, color)
    g1 = jax.grad(loss(spec_f), argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss(spec_p), argnums=(0, 1, 2, 3))(*args)
    for a_, b_, name in zip(g1, g2, ("mean2d", "cov2d", "opa", "color")):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        scale = max(float(np.abs(a_).max()), 1e-8)
        np.testing.assert_allclose(a_, b_, atol=2e-2 * scale, err_msg=name)


def test_bf16_pack_sh_gather_colors(rng):
    """bf16_pack composes with the SH gather_colors route: geometry packs
    (5 payloads) and the 27-coeff color block moves by one HALF-WIDTH row
    gather (bf16 pairs — >64 B rows cost 3.5x per row on TPU)."""
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=80, color_dim=27)
    rspec = rspec._replace(channel_major=True, color_row_major=True)
    spec_f = _colcap_spec(bspec)._replace(gather_colors=True)
    spec_p = _bf16_pack_spec(bspec, gather_colors=True)
    a, ma = pack_sorted(spec_f, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(spec_p, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    assert a[1].shape == b[1].shape
    # colors are bf16-roundtripped values moved by the same permutation:
    # where the f32 block is exactly representable the match is exact, and
    # everywhere within bf16 relative precision
    cf, cp = np.asarray(a[1]), np.asarray(b[1])
    np.testing.assert_allclose(cf, cp, atol=4e-3 * max(np.abs(cf).max(), 1),
                               rtol=8e-3)
    np.testing.assert_array_equal(np.asarray(a[0][:2]), np.asarray(b[0][:2]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-2, rtol=1e-2)

    def loss(spec):
        def f(opa_, color_):
            pk, mt = pack_sorted(spec, _geom_n(proj, opa_), color_,
                                 proj.depth, proj.visible)
            return jnp.sum(pk[0] ** 2) + jnp.sum(pk[1] ** 2)
        return f

    g1 = jax.grad(loss(spec_f), argnums=(0, 1))(opa, color)
    g2 = jax.grad(loss(spec_p), argnums=(0, 1))(opa, color)
    for a_, b_, name in zip(g1, g2, ("opa", "color")):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        scale = max(float(np.abs(a_).max()), 1e-8)
        np.testing.assert_allclose(a_, b_, atol=2e-2 * scale, err_msg=name)


def test_bf16_pack_requires_colcap(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    with pytest.raises(AssertionError, match="colcap"):
        pack_sorted(bspec._replace(bf16_pack=True), _geom_n(proj, opa),
                    color, proj.depth, proj.visible)


def test_quant_depth_close_to_exact_rank(rng):
    """18-bit quantized depth keys: with distinct depths the composite
    order only changes within 2^-18 depth bins, so the image should be
    ~identical to the exact-rank route; grads flow and diagnostics agree."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec = rspec._replace(channel_major=True)
    spec_f = _colcap_spec(bspec)
    spec_q = spec_f._replace(quant_depth=True)
    a, ma = pack_sorted(spec_f, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    b, mb = pack_sorted(spec_q, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    img_f = rasterize(a, ma, rspec, use_pallas=True, interpret=True)
    img_q = rasterize(b, mb, rspec, use_pallas=True, interpret=True)
    f, q = np.asarray(img_f), np.asarray(img_q)
    mse = float(((f - q) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45, psnr
    assert int(ma.n_pairs) == int(mb.n_pairs)
    assert int(ma.n_visible) == int(mb.n_visible)

    def loss(opa_):
        pk, mt = pack_sorted(spec_q, _geom_n(proj, opa_), color,
                             proj.depth, proj.visible)
        return jnp.sum(rasterize(pk, mt, rspec, use_pallas=True,
                                 interpret=True) ** 2)

    g = jax.grad(loss)(opa)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0

    # composes with bf16_pack (the production default route)
    spec_qb = spec_q._replace(bf16_pack=True)
    c, mc = pack_sorted(spec_qb, _geom_n(proj, opa), color,
                        proj.depth, proj.visible)
    img_qb = rasterize(c, mc, rspec, use_pallas=True, interpret=True)
    mse2 = float(((np.asarray(img_qb) - f) ** 2).mean())
    assert 10 * np.log10(1.0 / max(mse2, 1e-12)) > 40


def test_quant_depth_empty_scene(rng):
    """No visible gaussians: the quantized-depth normalization must not
    produce NaN/garbage keys (dmin=+inf guard)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    rspec = rspec._replace(channel_major=True)
    spec_q = _colcap_spec(bspec)._replace(quant_depth=True)
    vis = jnp.zeros_like(proj.visible)
    pk, meta = pack_sorted(spec_q, _geom_n(proj, opa), color,
                           proj.depth, vis)
    assert int(meta.n_pairs) == 0
    img = rasterize(pk, meta, rspec, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(img), 0.0)


# ---------------------------------------------------------------------------
# shared alignment-pad pool (pad_rows)
# ---------------------------------------------------------------------------

def test_pad_pool_matches_full(rng):
    """An adequately sized pool is bit-identical to the full reservation."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec = rspec._replace(channel_major=True)
    spec_full = _colcap_spec(bspec)
    a, meta_f = pack_sorted(spec_full, _geom_n(proj, opa), color,
                            proj.depth, proj.visible)
    need = int(meta_f.n_pad_used)
    assert need > 0          # scene has at least one partially filled tile
    for pool in (need, need + 37):
        spec_p = spec_full._replace(pad_rows=pool)
        b, meta_p = pack_sorted(spec_p, _geom_n(proj, opa), color,
                                proj.depth, proj.visible)
        assert int(meta_p.n_pad_used) == need
        assert int(meta_p.n_pad_dropped) == 0
        img_a = rasterize(a, meta_f, rspec, use_pallas=True, interpret=True)
        img_b = rasterize(b, meta_p, rspec, use_pallas=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


@pytest.mark.slow
def test_pad_pool_grads_match_full(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=120)
    rspec = rspec._replace(channel_major=True)
    spec_full = _colcap_spec(bspec)
    _, meta_f = pack_sorted(spec_full, _geom_n(proj, opa), color,
                            proj.depth, proj.visible)
    spec_p = spec_full._replace(pad_rows=int(meta_f.n_pad_used))

    def loss(spec):
        def f(mean2d, cov2d, opa_, color_):
            p = proj._replace(mean2d=mean2d, cov2d=cov2d)
            pk, mt = pack_sorted(spec, _geom_n(p, opa_), color_,
                                 p.depth, p.visible)
            img = rasterize(pk, mt, rspec, use_pallas=True, interpret=True)
            return jnp.sum(img ** 2)
        return f

    args = (proj.mean2d, proj.cov2d, opa, color)
    g1 = jax.grad(loss(spec_full), argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss(spec_p), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g1, g2, ("mean2d", "cov2d", "opa", "color")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=name)


@pytest.mark.slow
def test_pad_pool_overflow_fail_safe(rng):
    """Pool too small: alignment breaks CASCADE past the first short tile,
    so every tile from the break renders zero (tile_ok) and the intact
    prefix is bit-identical to the full-reservation render."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=150)
    rspec = rspec._replace(channel_major=True)
    spec_full = _colcap_spec(bspec)
    a, meta_f = pack_sorted(spec_full, _geom_n(proj, opa), color,
                            proj.depth, proj.visible)
    need = int(meta_f.n_pad_used)
    assert need > 8
    spec_p = spec_full._replace(pad_rows=need // 2)
    b, meta_p = pack_sorted(spec_p, _geom_n(proj, opa), color,
                            proj.depth, proj.visible)
    assert int(meta_p.n_pad_dropped) == need - need // 2
    ok_f = np.asarray(meta_f.tile_ok)[:-1]
    ok_p = np.asarray(meta_p.tile_ok)[:-1]
    # the ok set shrank to a prefix-of-tiles intersection
    assert ok_p.sum() < ok_f.sum()
    assert not np.any(ok_p & ~ok_f)
    img_a = np.asarray(rasterize(a, meta_f, rspec, use_pallas=True,
                                 interpret=True))
    img_b = np.asarray(rasterize(b, meta_p, rspec, use_pallas=True,
                                 interpret=True))
    assert np.isfinite(img_b).all()
    th, tw = rspec.tile_h, rspec.tile_w
    for t in range(bspec.n_tiles):
        ty, tx = divmod(t, bspec.n_tile_x)
        tile_b = img_b[:, ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
        if ok_p[t]:
            tile_a = img_a[:, ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            np.testing.assert_array_equal(tile_a, tile_b, err_msg=f"tile {t}")
        else:
            np.testing.assert_array_equal(tile_b, 0.0, err_msg=f"tile {t}")


def test_searchsorted_2level_exact(rng):
    """_searchsorted_2level / _count_le_small == jnp.searchsorted on random
    and edge inputs (empty prefix, all-equal runs, sentinel tail, pad)."""
    import numpy as np

    from gsplat_tpu.ops.binning import _count_le_small, _searchsorted_2level

    for p in (1, 5, 127, 128, 129, 1000, 4096 + 17):
        a = np.sort(rng.integers(0, 50, size=p).astype(np.int32))
        a[-1] = np.iinfo(np.int32).max  # sentinel tail like pair keys
        q = np.concatenate([
            np.arange(-2, 53, dtype=np.int32),
            np.array([np.iinfo(np.int32).max], np.int32)])
        want = np.searchsorted(a, q, side="left")
        got = np.asarray(_searchsorted_2level(jnp.asarray(a),
                                              jnp.asarray(q)))
        np.testing.assert_array_equal(got, want)
        want_r = np.searchsorted(a[:200], q, side="right")
        got_r = np.asarray(_count_le_small(jnp.asarray(a[:200]),
                                           jnp.asarray(q)))
        np.testing.assert_array_equal(got_r, want_r)
