#!/usr/bin/env python
"""Measure variadic-sort payload cost vs payload dtype/count on the TPU.

Decides the bf16 render-preset design: if payload cost is per-BYTE, packing
two bf16 channels into one f32 payload (bitcast) halves the pack_sorted
sort cost; if it is per-OPERAND, only reducing payload count helps.

Every output is consumed into the checksum (XLA prunes unconsumed variadic
sort operands — the round-1 'payloads are free' artifact, PERF.md).
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=6):
    fn(*args)  # compile
    # vary input each reznum to defeat result caches; time with host fetch
    t0 = time.perf_counter()
    for r in range(reps):
        float(fn(*args[:-1], args[-1] + r + 1))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (p,), 0, 4346, jnp.int32)
    payload_f32 = jax.random.uniform(key, (p,), jnp.float32)

    def consume(outs):
        return sum(o[::65537].astype(jnp.float32).sum() for o in outs)

    for n_pay, dtype in [(0, None), (1, jnp.float32), (5, jnp.float32),
                         (10, jnp.float32), (1, jnp.bfloat16),
                         (5, jnp.bfloat16), (10, jnp.bfloat16),
                         (1, jnp.int16), (5, jnp.int16)]:
        pays = tuple(payload_f32.astype(dtype) + i for i in range(n_pay)) \
            if n_pay else ()

        @jax.jit
        def run(keys, salt, _pays=pays):
            out = jax.lax.sort((keys + salt.astype(jnp.int32),) + _pays,
                               num_keys=1, is_stable=True)
            return consume(out)

        ms = timed(run, keys, jnp.float32(0))
        name = dtype.__name__ if dtype else "-"
        print(f"P={p} payloads={n_pay:2d} {name:9s} {ms:7.2f} ms")

    # packed variant: 10 bf16 channels as 5 bitcast-f32 payloads
    ch = [payload_f32.astype(jnp.bfloat16) + i for i in range(10)]
    packed = tuple(
        jax.lax.bitcast_convert_type(
            jnp.stack([ch[2 * i], ch[2 * i + 1]], axis=-1), jnp.float32)
        for i in range(5))

    @jax.jit
    def run_packed(keys, salt):
        out = jax.lax.sort((keys + salt.astype(jnp.int32),) + packed,
                           num_keys=1, is_stable=True)
        return consume(out)

    ms = timed(run_packed, keys, jnp.float32(0))
    print(f"P={p} payloads= 5 f32(2xbf16-packed) {ms:7.2f} ms")

    # the pack cost itself (stack+bitcast at V scale is what the real path
    # would pay before broadcasting to the plane)
    v = 330_000
    cols = [jax.random.uniform(key, (v,), jnp.float32) for _ in range(10)]

    @jax.jit
    def pack_cost(salt):
        out = []
        for i in range(5):
            a = (cols[2 * i] + salt).astype(jnp.bfloat16)
            b = cols[2 * i + 1].astype(jnp.bfloat16)
            out.append(jax.lax.bitcast_convert_type(
                jnp.stack([a, b], axis=-1), jnp.float32))
        return sum(o[::997].sum() for o in out)

    ms = timed(pack_cost, jnp.float32(0))
    print(f"V={v} bf16-pack cost {ms:7.2f} ms")


if __name__ == "__main__":
    main()
