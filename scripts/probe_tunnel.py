#!/usr/bin/env python
"""Tunnel health probe — run BEFORE committing to host-interactive TPU work.

Remote-attached TPU sessions vary ~14x in host<->device bandwidth (round 5:
the same 183 MB scene push took 293 s that round 3 did in 21 s).  Training
runs are host-boundary-dominated (per-window metrics/checkpoint/eval
round-trips), so on a slow tunnel a 7k run's wall-clock measures the tunnel,
not the device — while scan-slope benches stay valid.  This prints a push
bandwidth + dispatch round-trip estimate and a go/no-go hint.

Usage:  python scripts/probe_tunnel.py  [--mb 16]
"""

import argparse
import time


def probe(mb=16, verbose=True):
    """Measure tunnel health; returns {"rt_ms", "push_mb_s", "slow"}.

    Importable so long-running drivers (scripts/run_garden_7k.py) can scale
    their save/eval cadence to the measured host boundary instead of paying
    a fixed 10.8 MB save every 200 iters on a 14x-degraded session.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if verbose:
        print(f"device: {dev}")

    # dispatch round-trip: tiny jit + host scalar fetch, fresh input each
    # call (identical dispatches can be served from a result cache)
    f = jax.jit(lambda a: jnp.sum(a * 2.0))
    float(f(jnp.arange(128.0)))  # compile
    t0 = time.time()
    n_rt = 10
    for i in range(n_rt):
        float(f(jnp.arange(128.0) + i))
    rt_ms = (time.time() - t0) / n_rt * 1e3
    if verbose:
        print(f"dispatch+fetch round-trip: {rt_ms:.0f} ms")

    # push bandwidth: one uint8 array, verified on device by a host fetch.
    # Warm up the fetch expression first on a tiny same-rank/dtype array —
    # on remote-attached sessions a first compile can stall minutes and
    # would otherwise be billed to the push, flipping the go/no-go hint.
    warm = jnp.asarray(np.zeros((1, 4, 4), np.uint8))
    float(jnp.sum(warm[:, :2, :2].astype(jnp.float32)))
    a = np.random.randint(0, 255, (mb, 1024, 1024), np.uint8)
    t0 = time.time()
    d = jnp.asarray(a)
    float(jnp.sum(d[:, :2, :2].astype(jnp.float32)))
    dt = time.time() - t0
    bw = mb / max(dt, 1e-9)
    if verbose:
        print(f"push {mb} MB: {dt:.2f} s  ({bw:.1f} MB/s)")

    slow = bw < 3 or rt_ms > 100
    if verbose:
        if slow:
            print("SLOW TUNNEL: prefer scan-slope benches; defer "
                  "host-interactive training runs (see PERF.md round 5)")
        else:
            print("tunnel healthy: long training runs OK")
    return {"rt_ms": rt_ms, "push_mb_s": bw, "slow": slow}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=16)
    args = ap.parse_args()
    probe(mb=args.mb)


if __name__ == "__main__":
    main()
