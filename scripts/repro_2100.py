#!/usr/bin/env python
"""Reproduce the deterministic TPU worker crash right after densify @2100
in the 7k garden run: resume from the iter-2000 checkpoint, log every
compile and the budget/K state around each densify, and run a short span
past the crash point with fine-grained metrics windows."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_log_compiles", True)

from gsplat_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from gsplat_tpu.train import build_argparser, configs_from_args, Trainer
from gsplat_tpu.models.splatter import Splatter

scene = "/tmp/garden_synth"
exp = "runs/7k_garden_r3"
flags = [
    "--data", scene, "--exp", "/tmp/repro2100",
    "--n_iters", "2161",
    "--grad_thresh", "0.000002", "--ssim_weight", "0.1", "--lr", "0.002",
    "--grad_accum_method", "mean", "--grad_accum_iters", "300",
    "--split_thresh", "0.08",
    "--use_sh_coeff", "0",
    "--n_save_train_img", "100000",
    "--metrics_every", "10",
]
a = build_argparser().parse_args(flags)
scfg, tcfg = configs_from_args(a)
t0 = time.time()
splat = Splatter(os.path.join(scene, "sparse", "0"),
                 os.path.join(scene, "images_4"), scfg)
trainer = Trainer(splat, tcfg)
start = trainer.load_full(os.path.join(exp, "full_state.npz")) + 1
print(f"resumed at {start} K={splat.cfg.max_tiles_per_gaussian} "
      f"pair_cap={splat.cfg.pair_capacity} vis={splat.cfg.visible_rows} "
      f"col_caps={splat.cfg.col_caps}", flush=True)

orig = trainer._densify


def densify_logged(i_iter, _ac, _in_reset):
    c = splat.cfg
    print(f"[pre-densify @{i_iter}] K={c.max_tiles_per_gaussian} "
          f"pair_cap={c.pair_capacity} vis={c.visible_rows} "
          f"col_caps={c.col_caps} "
          f"last_metrics={ {k: (int(v) if hasattr(v, '__int__') else v) for k, v in (trainer._last_metrics or {}).items() if k != 'col_fill'} } "
          f"col_fill={list(map(int, (trainer._last_metrics or {}).get('col_fill', ())))}",
          flush=True)
    orig(i_iter, _ac, _in_reset)
    print(f"[post-densify @{i_iter}] K={c.max_tiles_per_gaussian} "
          f"pair_cap={c.pair_capacity} vis={c.visible_rows} "
          f"col_caps={c.col_caps} n_live={int(splat.table.n_live)}",
          flush=True)


trainer._densify = densify_logged


def log(*x):
    print(f"[{time.time()-t0:7.1f}s]", *x, flush=True)


trainer.train(metrics_every=a.metrics_every, log=log, start=start)
print("PASSED the crash point", flush=True)
