"""realign_slots_xla: the post_align realignment oracle.

The production realignment is fused into the forward raster kernel
(RasterSpec.post_align, covered end-to-end by tests/test_fused_pack.py's
post_align render-equality tests); this checks the XLA helper's contract
directly — per-chunk contiguous copies, dead-lane zeroing, and clamped
out-of-range dead chunks.
"""

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops.realign import realign_slots_xla


def test_contract():
    p_rows = 1024
    pay = (jnp.arange(1, p_rows + 1, dtype=jnp.int32),
           -jnp.arange(1, p_rows + 1, dtype=jnp.int32))
    chunk_src = jnp.asarray([0, 128, 130, 512, 5000], jnp.int32)
    chunk_len = jnp.asarray([128, 0, 64, 128, 0], jnp.int32)
    got = realign_slots_xla(pay, chunk_src, chunk_len, 5 * 128)
    a = np.asarray(got[0]).reshape(5, 128)
    b = np.asarray(got[1]).reshape(5, 128)
    np.testing.assert_array_equal(a[0], np.arange(1, 129))
    np.testing.assert_array_equal(a[1], np.zeros(128))
    np.testing.assert_array_equal(
        a[2], np.concatenate([np.arange(131, 131 + 64), np.zeros(64)]))
    np.testing.assert_array_equal(a[3], np.arange(513, 513 + 128))
    np.testing.assert_array_equal(a[4], np.zeros(128))  # clamped dead chunk
    np.testing.assert_array_equal(b, -a)
