"""Checkpoint IO — npz native format + reference ``ckpt.pth`` interop.

The reference checkpoints the five raw parameter tensors
``{pos, opa, rgb, quat, scale}`` with ``torch.save`` (``train.py:283-291``)
and reloads them as nn.Parameters (``splatter.py:417-424``) — weights-only,
no optimizer state or step counter.  We write the same dict as a compressed
``.npz`` (live rows only) and can read/write ``.pth`` when torch is present,
so checkpoints are exchangeable with the reference tooling.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.models.gaussians import GaussianTable
from gsplat_tpu.utils.so3 import inverse_sigmoid

KEYS = ("pos", "opa", "rgb", "quat", "scale")


def _live_arrays(table: GaussianTable) -> dict:
    live = np.asarray(table.live)
    return {k: np.asarray(getattr(table, k))[live] for k in KEYS}


def save_checkpoint(table: GaussianTable, path: str):
    arrays = _live_arrays(table)
    if str(path).endswith(".pth"):
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in arrays.items()}, path)
    else:
        np.savez_compressed(path, **arrays)


def _from_arrays(arrays: dict, capacity_round: int,
                 headroom: float = 1.25) -> GaussianTable:
    n = arrays["pos"].shape[0]
    cap = max(int(math.ceil(n * headroom / capacity_round)) * capacity_round,
              capacity_round)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    quat_fill = np.zeros((cap, 4), np.float32)
    quat_fill[:, 0] = 1.0
    quat_fill[:n] = arrays["quat"]
    live = np.zeros((cap,), bool)
    live[:n] = True
    return GaussianTable(
        pos=pad(arrays["pos"]),
        rgb=pad(arrays["rgb"]),
        opa=pad(arrays["opa"].reshape(n), fill=inverse_sigmoid(1e-4)),
        quat=jnp.asarray(quat_fill),
        scale=pad(arrays["scale"]),
        live=jnp.asarray(live),
        n_live=jnp.asarray(n, jnp.int32),
    )


def load_checkpoint(path: str, capacity_round: int = 65536) -> GaussianTable:
    if str(path).endswith(".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        arrays = {k: ckpt[k].detach().float().numpy() for k in KEYS}
    else:
        with np.load(path) as z:
            arrays = {k: z[k] for k in KEYS}
    return _from_arrays(arrays, capacity_round)
