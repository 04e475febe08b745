#!/usr/bin/env python
"""Measure variadic-sort payload cost vs payload dtype/count on the TPU.

Decides the bf16 render-preset design: if payload cost is per-BYTE, packing
two bf16 channels into one f32 payload (bitcast) halves the pack_sorted
sort cost; if it is per-OPERAND, only reducing payload count helps.

Timing is IN-GRAPH: the sort runs inside a lax.scan and the cost is the
slope between two scan lengths with one host fetch each — per-dispatch
tunnel round-trips (~30 ms on remote-attached TPUs) never enter the
measurement.  Every sort output feeds the checksum (XLA prunes unconsumed
variadic-sort operands — the round-1 'payloads are free' artifact,
PERF.md).
"""

import time
import sys

import jax
import jax.numpy as jnp


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (p,), 0, 4346, jnp.int32)
    payload_f32 = jax.random.uniform(key, (p,), jnp.float32)

    def consume(outs):
        return sum(o[::65537].astype(jnp.float32).sum() for o in outs)

    def slope(make_sort):
        def scan_fn(reps):
            @jax.jit
            def run(keys, salt):
                def body(acc, r):
                    out = make_sort(keys ^ (salt.astype(jnp.int32) + r))
                    return acc + consume(out), None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(reps, dtype=jnp.int32))
                return acc
            return run

        small, big = scan_fn(2), scan_fn(8)
        float(small(keys, jnp.float32(0)))
        float(big(keys, jnp.float32(0)))
        ts = []
        for r in range(2):
            t0 = time.perf_counter()
            float(small(keys, jnp.float32(r + 1)))
            t1 = time.perf_counter()
            float(big(keys, jnp.float32(r + 1)))
            ts.append((time.perf_counter() - t1) - (t1 - t0))
        return min(ts) / 6 * 1e3  # ms per sort

    results = {}
    for n_pay, dtype in [(0, None), (1, jnp.float32), (5, jnp.float32),
                         (10, jnp.float32), (5, jnp.bfloat16),
                         (10, jnp.bfloat16), (5, jnp.int16)]:
        pays = tuple(payload_f32.astype(dtype) + i for i in range(n_pay)) \
            if n_pay else ()

        def mk(k, _pays=pays):
            return jax.lax.sort((k,) + _pays, num_keys=1, is_stable=True)

        ms = slope(mk)
        name = dtype.__name__ if dtype else "-"
        results[(n_pay, name)] = ms
        print(f"P={p} payloads={n_pay:2d} {name:9s} {ms:7.2f} ms",
              flush=True)

    # packed variant: 10 bf16 channels as 5 bitcast-f32 payloads
    ch = [payload_f32.astype(jnp.bfloat16) + i for i in range(10)]
    packed = tuple(
        jax.lax.bitcast_convert_type(
            jnp.stack([ch[2 * i], ch[2 * i + 1]], axis=-1), jnp.float32)
        for i in range(5))

    def mk_packed(k):
        return jax.lax.sort((k,) + packed, num_keys=1, is_stable=True)

    ms = slope(mk_packed)
    print(f"P={p} payloads= 5 f32(2xbf16-packed) {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
