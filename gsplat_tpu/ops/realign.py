"""Chunk realignment of sorted payload rows (post_align support).

The ``post_align`` binning route (ops/binning.py) sorts ONLY the real
candidate rows — no alignment-pad rows ride the payload sort — which drops
the sort into a smaller lax.sort power-of-two row bucket (1.00M real pairs
fit 2^20 where pairs+pads paid the 2^21 bucket at the Garden preset).  The
chunk-aligned view the rasterizer needs is

    slot (c, j)  =  sorted row  chunk_src[c] + j,   j < chunk_len[c]

with the remaining lanes dead.  The production path never materializes
that view: the forward raster kernel realigns in-kernel from two 128-lane
windows per chunk (RasterSpec.post_align — scalar-prefetch index maps +
``_realign2``'s dynamic roll/select), which costs no extra HBM pass at all.

This module holds the XLA realignment used by the non-pallas consumers
(the jnp compositor/oracle path in ``rasterize``) and as the test oracle.

Implementation notes, measured on v5e at the Garden preset (round 5):
- this XLA row-matrix gather costs 6.3 ms for 1.32M x 5 i32 slots
  (~4 GB/s) — MORE than the 2.9 ms the smaller sort bucket saves, which
  is why the kernel-fused path exists;
- a standalone pallas realign kernel (windowed manual DMA with dynamic
  ``.at[pl.ds(q0, w)]`` offsets + per-chunk roll) crashed the TPU worker
  on this backend even at toy sizes, while the same roll/select constructs
  inside a standard BlockSpec-pipelined kernel work — hence in-kernel
  fusion rather than a separate pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def realign_slots_xla(pay, chunk_src, chunk_len, s):
    """Gather sorted payload rows into chunk-aligned slot rows.

    Args:
      pay: tuple of (P,) int32 sorted payload channels.
      chunk_src: (NC,) int32 — first sorted row of each chunk (live lanes
        satisfy chunk_src + lane < P; dead chunks may point anywhere).
      chunk_len: (NC,) int32 — live lanes per chunk.
      s: number of slots (NC * G).

    Returns tuple of (s,) int32 aligned channels, dead lanes zeroed.
    """
    g_sz = s // chunk_src.shape[0]
    p_rows = pay[0].shape[0]
    lane = jax.lax.iota(jnp.int32, g_sz)
    live2 = lane[None, :] < chunk_len[:, None]
    src2 = jnp.clip(chunk_src[:, None] + lane[None, :], 0, p_rows - 1)
    idx_s = jnp.where(live2, src2, p_rows).reshape(s)
    mat = jnp.concatenate(
        [jnp.stack(pay, axis=1),
         jnp.zeros((1, len(pay)), jnp.int32)], axis=0)
    g = jnp.take(mat, idx_s, axis=0)
    return tuple(g[:, j] for j in range(len(pay)))
