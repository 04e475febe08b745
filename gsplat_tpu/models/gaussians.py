"""Fixed-capacity gaussian parameter table + adaptive density control.

The reference stores five learnable tensors that change length at every
densification step (``splatter.py:39-228`` Gaussian3ds: delete → boolean
index, clone/split → torch.cat, each wrapped in fresh nn.Parameters and a
brand-new Adam, ``train.py:173-181``).  Dynamic lengths are poison for XLA,
so the TPU design keeps every array padded to a static ``capacity`` with a
``live`` mask:

- deletes flip mask bits;
- clones/splits are scattered into compacted slots of the same buffer;
- capacity grows by bucketed rebuilds on the host only when occupancy
  crosses a threshold (one recompile per bucket, not per step);
- optimizer moments are zeroed alongside (the reference's "new Adam each
  densification" behaviour for free).

Everything in :func:`adaptive_control` runs under ``jit`` with donated
buffers; semantics follow ``splatter.py:122-228`` exactly (thresholds,
1.6 split-scale factor, two-point covariance sampling, clone position nudged
against the accumulated gradient).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops.projection import activate_scale
from gsplat_tpu.ops.sh import initialize_sh
from gsplat_tpu.utils.so3 import inverse_sigmoid, quat_to_rotmat


class GaussianTable(NamedTuple):
    pos: jnp.ndarray     # (N, 3)
    rgb: jnp.ndarray     # (N, 3) logits or (N, 27) SH coeffs
    opa: jnp.ndarray     # (N,)  logits
    quat: jnp.ndarray    # (N, 4) wxyz, unnormalized
    scale: jnp.ndarray   # (N, 3) raw (abs-activated or log)
    live: jnp.ndarray    # (N,)  bool
    n_live: jnp.ndarray  # ()    int32

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def params(self) -> dict:
        """The five optimizable leaves (reference train.py:56-62 groups)."""
        return {"pos": self.pos, "rgb": self.rgb, "opa": self.opa,
                "quat": self.quat, "scale": self.scale}

    def with_params(self, p: dict) -> "GaussianTable":
        return self._replace(pos=p["pos"], rgb=p["rgb"], opa=p["opa"],
                             quat=p["quat"], scale=p["scale"])


def _round_capacity(n: int, bucket: int) -> int:
    return max(int(math.ceil(n / bucket)) * bucket, bucket)


def init_from_points(
    points: np.ndarray,
    rgbs_uint8: np.ndarray,
    use_sh_coeff: bool = False,
    opa_init_value: float = 0.3,
    scale_init_value: float = 1.0,
    scale_activation: str = "abs",
    capacity_round: int = 65536,
    headroom: float = 1.25,
) -> GaussianTable:
    """COLMAP point cloud → initial gaussian table.

    Mirrors reference scene init (``splatter.py:373-406``): color logits via
    inverse sigmoid of rgb/255 (optionally spread into SH DC terms), opacity
    logits at a constant, identity quaternions, isotropic scales set to the
    mean distance of the 3 nearest neighbours times ``scale_init_value``
    (log-space for the exp activation), via a KD-tree.
    """
    from scipy.spatial import cKDTree

    n = points.shape[0]
    rgb01 = np.clip(rgbs_uint8.astype(np.float64) / 255.0, 1e-4, 1 - 1e-4)
    rgb_logit = -np.log(1.0 / rgb01 - 1.0)

    dist, _ = cKDTree(points).query(points, k=4)
    mean3 = dist[:, 1:].mean(axis=1) * scale_init_value
    if scale_activation == "exp":
        mean3 = np.log(np.maximum(mean3, 1e-12))

    cap = _round_capacity(int(n * headroom), capacity_round)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    rgb = initialize_sh(jnp.asarray(rgb_logit, jnp.float32)) if use_sh_coeff \
        else jnp.asarray(rgb_logit, jnp.float32)
    rgb = jnp.concatenate(
        [rgb, jnp.zeros((cap - n, rgb.shape[1]), jnp.float32)], axis=0)

    quat0 = np.zeros((n, 4), np.float32)
    quat0[:, 0] = 1.0
    live = np.zeros((cap,), bool)
    live[:n] = True
    return GaussianTable(
        pos=pad(points.astype(np.float32)),
        rgb=rgb,
        opa=pad(np.full((n,), inverse_sigmoid(opa_init_value), np.float32)),
        quat=jnp.concatenate(
            [jnp.asarray(quat0),
             jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (cap - n, 1))]),
        scale=pad(np.repeat(mean3[:, None], 3, axis=1).astype(np.float32)),
        live=jnp.asarray(live),
        n_live=jnp.asarray(n, jnp.int32),
    )


class DensifyStats(NamedTuple):
    n_deleted: jnp.ndarray
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    overflowed: jnp.ndarray  # bool — capacity exhausted, host should grow
    n_wanted: jnp.ndarray    # () int32 — keep+clone+split (pre-clamp total)


# NOT donated: on overflow the trainer re-runs the control step on the
# pre-control table after growing capacity (the reference never drops
# proposals — torch.cat, splatter.py:225-228), so the input must survive.
@partial(jax.jit, static_argnames=("scale_activation", "grad_aggregation"))
def adaptive_control(
    table: GaussianTable,
    grad: jnp.ndarray,            # (N, 3) accumulated |pos grad| (averaged)
    rng: jax.Array,
    taus: float,
    delete_thresh: float,
    grad_thresh: float,
    clone_dt: float,
    use_clone,                    # traced bool (varies during opa-reset window)
    use_split,
    scale_activation: str = "abs",
    grad_aggregation: str = "max",
) -> tuple[GaussianTable, DensifyStats]:
    """delete / clone / split, compacted into the same fixed-capacity table.

    Semantics per reference ``Gaussian3ds.adaptive_control``
    (splatter.py:122-228) driven as in ``train.py:156-182``.
    """
    cap = table.capacity
    s_act = activate_scale(table.scale, scale_activation)
    scale_norm = jnp.linalg.norm(s_act, axis=-1)

    # 1. delete: low opacity or oversized (splatter.py:141-155)
    keep = table.live & (table.opa > inverse_sigmoid(0.02)) \
        & (scale_norm < delete_thresh)
    n_deleted = jnp.sum(table.live & ~keep)

    # 2. densify candidates (splatter.py:158-174)
    if grad_aggregation == "max":
        g = jnp.max(jnp.abs(grad), axis=-1)
    else:
        g = jnp.mean(jnp.abs(grad), axis=-1)
    densify = keep & (g > grad_thresh)
    split = densify & (scale_norm > taus) & use_split
    clone = densify & (scale_norm <= taus) & use_clone

    n_keep = jnp.sum(keep)
    n_clone = jnp.sum(clone)
    n_split = jnp.sum(split)

    # 3. split scale shrink + two-point sampling (splatter.py:190-223)
    if scale_activation == "abs":
        new_scale = jnp.where(split[:, None], table.scale / 1.6, table.scale)
    else:
        new_scale = jnp.where(split[:, None], table.scale - math.log(1.6),
                              table.scale)
    # sample p1, p2 ~ N(pos, R S Sᵀ Rᵀ) as pos + (R S) ε, ε ~ N(0, I)
    q = table.quat / (jnp.linalg.norm(table.quat, axis=-1, keepdims=True) + 1e-12)
    RS = quat_to_rotmat(q) * s_act[:, None, :]
    eps = jax.random.normal(rng, (cap, 2, 3))
    p1 = table.pos + jnp.einsum("nij,nj->ni", RS, eps[:, 0])
    p2 = table.pos + jnp.einsum("nij,nj->ni", RS, eps[:, 1])

    # kept slots: split originals take p1 (splatter.py:210-212)
    kept_pos = jnp.where(split[:, None], p1, table.pos)
    clone_pos = table.pos - grad * clone_dt         # splatter.py:177-178

    # 4. compact [kept..., clones..., splits...] via three masked scatters
    keep_rank = jnp.cumsum(keep) - 1
    clone_rank = n_keep + jnp.cumsum(clone) - 1
    split_rank = n_keep + n_clone + jnp.cumsum(split) - 1
    oob = jnp.int32(cap)
    keep_idx = jnp.where(keep, keep_rank, oob)
    clone_idx = jnp.where(clone & (clone_rank < cap), clone_rank, oob)
    split_idx = jnp.where(split & (split_rank < cap), split_rank, oob)

    def compact(kept_vals, clone_vals, split_vals, fill=0.0):
        out = jnp.full(kept_vals.shape, fill, kept_vals.dtype)
        out = out.at[keep_idx].set(kept_vals, mode="drop")
        out = out.at[clone_idx].set(clone_vals, mode="drop")
        out = out.at[split_idx].set(split_vals, mode="drop")
        return out

    new_n = jnp.minimum(n_keep + n_clone + n_split, cap).astype(jnp.int32)
    overflowed = (n_keep + n_clone + n_split) > cap
    new_live = jnp.arange(cap) < new_n

    new_table = GaussianTable(
        pos=compact(kept_pos, clone_pos, p2),
        rgb=compact(table.rgb, table.rgb, table.rgb),
        opa=compact(table.opa, table.opa, table.opa,
                    fill=inverse_sigmoid(1e-4)),
        quat=compact(table.quat, table.quat, table.quat),
        scale=compact(new_scale, table.scale, new_scale),
        live=new_live,
        n_live=new_n,
    )
    stats = DensifyStats(n_deleted=n_deleted, n_cloned=n_clone,
                         n_split=n_split, overflowed=overflowed,
                         n_wanted=(n_keep + n_clone + n_split
                                   ).astype(jnp.int32))
    return new_table, stats


def reset_opacity(table: GaussianTable) -> GaussianTable:
    """Clamp all live opacities to logit(0.01) (splatter.py:119-120)."""
    new_opa = jnp.where(table.live, inverse_sigmoid(0.01), table.opa)
    return table._replace(opa=new_opa.astype(table.opa.dtype))


def grow_capacity(table: GaussianTable, capacity_round: int,
                  headroom: float = 1.5,
                  min_capacity: int = 0,
                  max_capacity: int = 0) -> GaussianTable:
    """Host-side bucketed capacity growth (recompile boundary).

    ``min_capacity`` forces at least that many slots — used by the
    densify-overflow retry, where the needed total (stats.n_wanted) can
    exceed occupancy-based growth.  ``max_capacity`` (0 = unlimited) caps
    the result — quality-proof runs bound their trainable budget."""
    n = int(table.n_live)
    new_cap = _round_capacity(max(int(n * headroom), min_capacity),
                              capacity_round)
    if max_capacity:
        new_cap = min(new_cap, max(_round_capacity(max_capacity,
                                                   capacity_round),
                                   table.capacity))
    if new_cap <= table.capacity:
        return table

    def pad(x, fill=0.0):
        extra = np.full((new_cap - x.shape[0],) + x.shape[1:], fill,
                        np.asarray(x).dtype)
        return jnp.concatenate([x, jnp.asarray(extra)], axis=0)

    return GaussianTable(
        pos=pad(table.pos), rgb=pad(table.rgb),
        opa=pad(table.opa, fill=inverse_sigmoid(1e-4)),
        quat=pad(table.quat), scale=pad(table.scale),
        live=pad(table.live, fill=False),
        n_live=table.n_live,
    )
