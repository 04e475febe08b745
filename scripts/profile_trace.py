#!/usr/bin/env python
"""XLA-op attribution for a fused render frame / train step via
jax.profiler traces (perfetto JSON), grouped by op category.

Usage: python scripts/profile_trace.py [render|train] [n_gaussians]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

from gsplat_tpu.config import SplatConfig, TrainConfig
from gsplat_tpu.models.splatter import make_specs, render_padded
from gsplat_tpu.synthetic import synthetic_cameras, synthetic_table
from gsplat_tpu.train import TrainState, adam_update, init_adam, make_loss_fn


def build(n_gauss=506_627, w=1297, h=840, focal=1000.0, px_split=0,
          use_sh=False):
    from gsplat_tpu.synthetic import tune_budgets
    from gsplat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = SplatConfig(use_pallas=True, use_sh_coeff=use_sh)
    if px_split:
        cfg.px_split = px_split
    tcfg = TrainConfig(ssim_weight=0.1)
    table = synthetic_table(n_gauss, focal=focal, scale_px=2.5,
                            use_sh=use_sh, frustum=(0.85, 0.55))
    cams = synthetic_cameras(8, w, h, focal)
    grid = cams["grid"]
    c_dim = 27 if use_sh else 3
    bspec, rspec = make_specs(grid, table.capacity, cfg, c_dim)
    # bench-equivalent tuned budgets so the trace reflects the timed regime
    nv, npair, fills = tune_budgets(cfg, table, cams, grid, bspec)
    bspec, rspec = make_specs(grid, table.capacity, cfg, c_dim)
    print(f"# tuned: n_visible={nv} n_pairs={npair} "
          f"slot_cap={bspec.slot_capacity} NC={bspec.num_chunks}")
    return cfg, tcfg, table, cams, grid, bspec, rspec


def trace_and_attribute(fn, args, outdir):
    os.makedirs(outdir, exist_ok=True)
    fn(*args)  # warm / compile
    jax.profiler.start_trace(outdir)
    for r in range(3):
        fn(*args[:-1], args[-1] + r + 1)
    jax.profiler.stop_trace()
    files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace json under {outdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    # device-track complete events
    pid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    bucket = defaultdict(float)
    singles = defaultdict(float)
    total = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us → ms
        total += dur
        key = name.split(".")[0].split("(")[0]
        bucket[key] += dur
        singles[name[:70]] += dur
    return bucket, singles, total


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "render"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 506_627
    use_sh = len(sys.argv) > 3 and sys.argv[3] == "sh"
    preset = len(sys.argv) > 3 and sys.argv[3] == "preset"
    cfg, tcfg, table, cams, grid, bspec, rspec = build(n, use_sh=use_sh)
    if preset:
        # deployment render route (bench.py preset_ok branch): bf16-packed
        # payloads, re-specced
        import dataclasses as _dc
        cfg = _dc.replace(cfg, packed_bf16=True)
        bspec, rspec = make_specs(grid, table.capacity, cfg, 3)
    params, live = table.params(), table.live
    loss_fn = make_loss_fn(grid, cfg, tcfg, bspec, rspec, False)

    if mode == "render":
        @jax.jit
        def run(params, live, salt):
            img, _ = render_padded(params, live, cams["w2c_rot"][0],
                                   cams["w2c_tran"][0] + salt * 0.0,
                                   cams["sh_vecs"][0], grid, cfg, bspec,
                                   rspec)
            return img[0, 0, 0]
        args = (params, live, jnp.float32(0.0))

        def call(p, l, s):
            return float(run(p, l, s))
    else:
        @jax.jit
        def run(st, salt):
            gt = cams["images"][0].astype(jnp.float32) / 255.0
            grads, (m, aux, _img) = jax.grad(loss_fn, has_aux=True)(
                st.params, st.live, cams["w2c_rot"][0],
                cams["w2c_tran"][0] + salt * 0.0, cams["sh_vecs"][0], gt)
            p, o = adam_update(st.params, grads, st.opt,
                               jnp.full((5,), 1e-3, jnp.float32),
                               tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
            return m["loss"] + p["pos"][0, 0]
        st = TrainState(params=params, live=live, opt=init_adam(params),
                        accum_grad=jnp.zeros_like(params["pos"]),
                        grad_counter=jnp.zeros(table.capacity, jnp.float32))
        args = (st, jnp.float32(0.0))

        def call(s, salt):
            return float(run(s, salt))

    bucket, singles, total = trace_and_attribute(call, args,
                                                 f"/tmp/trace_{mode}")
    print(f"== {mode} device total {total:.1f} ms over 3 reps "
          f"(~{total/3:.1f} ms each) ==")
    for k, v in sorted(bucket.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/3:9.2f} ms  {k}")
    print("-- top individual ops --")
    for k, v in sorted(singles.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/3:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
