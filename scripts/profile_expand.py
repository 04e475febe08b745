#!/usr/bin/env python
"""Microbench: contiguous-slice expansion vs pad rows in the payload sort.

The fused pack pays T*(G-1) pad rows (~550k at Garden scale, ~30% of the
payload sort's rows) so the sort output IS the G-aligned slot buffer.  The
alternative: sort only the P real pairs, then expand each chunk's G-slice
out of the sorted buffer with a contiguous-slice gather
(operand (P,), starts (NC, 1), slice_sizes=(G,)) — chunk c of tile t reads
sorted positions [starts[t] + G*within, ...+G), known analytically from the
chunk metadata.  This measures whether XLA's slice-gather is cheap enough
(vs ~1.3 ms/operand of pad rows riding the sort) to drop the pads.

Scan-slope timing (see profile_sort_payloads.py for why).
"""

import time

import jax
import jax.numpy as jnp

P = 1_270_000
NC = 11_193
G = 128
S = NC * G
N_CH = 6


def slope(make, *args):
    def scan_fn(reps):
        @jax.jit
        def run(salt, *a):
            def body(acc, r):
                return acc + make(salt.astype(jnp.int32) + r, *a), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(reps, dtype=jnp.int32))
            return acc
        return run

    small, big = scan_fn(2), scan_fn(10)
    float(small(jnp.float32(0), *args))
    float(big(jnp.float32(0), *args))
    ts = []
    for r in range(2):
        t0 = time.perf_counter()
        float(small(jnp.float32(r + 1), *args))
        t1 = time.perf_counter()
        float(big(jnp.float32(r + 1), *args))
        ts.append((time.perf_counter() - t1) - (t1 - t0))
    return min(ts) / 8 * 1e3  # ms per rep


def main():
    key = jax.random.PRNGKey(0)
    chans = tuple(jax.random.uniform(key, (P,), jnp.float32) + i
                  for i in range(N_CH))
    # chunk starts: sorted, G-ish strides with jitter (realistic fills)
    fills = jax.random.randint(key, (NC,), 1, G + 1, jnp.int32)
    fills = (fills * (P / float(jnp.sum(fills)))).astype(jnp.int32)
    src0 = jnp.cumsum(fills) - fills[0]
    src0 = jnp.clip(src0, 0, P - G).astype(jnp.int32)

    def consume(x):
        return x.reshape(-1)[::65537].astype(jnp.float32).sum()

    # --- A: lax.gather contiguous slices, per channel -------------------
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(),
        start_index_map=(0,))

    def mk_slice_gather(salt, src0, *chans):
        acc = jnp.float32(0)
        s0 = jnp.clip(src0 + salt % 2, 0, P - G)[:, None]
        for c in chans:
            out = jax.lax.gather(c, s0, dn, slice_sizes=(G,),
                                 mode=jax.lax.GatherScatterMode.CLIP)
            acc += consume(out)
        return acc

    ms = slope(mk_slice_gather, src0, *chans)
    print(f"A slice-gather  (NC={NC}, G={G}) x{N_CH}ch: {ms:7.2f} ms",
          flush=True)

    # --- B: same via take with (NC, G) index matrix ----------------------
    def mk_take(salt, src0, *chans):
        acc = jnp.float32(0)
        idx = (jnp.clip(src0 + salt % 2, 0, P - G)[:, None]
               + jax.lax.iota(jnp.int32, G)[None, :])
        for c in chans:
            acc += consume(jnp.take(c, idx))
        return acc

    ms = slope(mk_take, src0, *chans)
    print(f"B take (NC,G) idx matrix        x{N_CH}ch: {ms:7.2f} ms",
          flush=True)

    # --- C: stacked channels, one gather of (N_CH, G) slices -------------
    stacked = jnp.stack(chans, axis=0)  # (N_CH, P)
    dn2 = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(1,))

    def mk_stacked(salt, src0, stacked):
        s0 = jnp.clip(src0 + salt % 2, 0, P - G)[:, None]
        out = jax.lax.gather(stacked, s0, dn2, slice_sizes=(N_CH, G),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return consume(out)  # (NC, N_CH, G)

    ms = slope(mk_stacked, src0, stacked)
    print(f"C one gather of (ch,G) slices   x{N_CH}ch: {ms:7.2f} ms",
          flush=True)

    # --- D: the cost being replaced: pad rows riding the sort ------------
    PADS = 552_000
    keys_p = jax.random.randint(key, (P + PADS,), 0, 1 << 30, jnp.int32)

    def mk_sort(salt, keys_p, *chans):
        pad = jnp.zeros((PADS,), jnp.float32)
        ops = (keys_p ^ salt,) + tuple(
            jnp.concatenate([c, pad]) for c in chans)
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return sum(consume(o) for o in out)

    ms_padded = slope(mk_sort, keys_p, *chans)
    keys_np = keys_p[:P]

    def mk_sort_np(salt, keys_np, *chans):
        ops = (keys_np ^ salt,) + chans
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return sum(consume(o) for o in out)

    ms_nopad = slope(mk_sort_np, keys_np, *chans)
    print(f"D sort P+pads({PADS}) {N_CH}+1 ops: {ms_padded:7.2f} ms | "
          f"no-pad: {ms_nopad:7.2f} ms | delta {ms_padded - ms_nopad:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
