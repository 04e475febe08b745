"""Full-state checkpoint: training resumes bit-exact (params, Adam moments,
grad accumulators, step counter)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gsplat_tpu.config import TrainConfig
from gsplat_tpu.train import Trainer

from fixtures import make_scene
from test_train_e2e import _splat


pytestmark = pytest.mark.slow  # e2e tier: run with -m slow

def test_full_resume_bit_exact(tmp_path):
    make_scene(str(tmp_path / "scene"), n_points=80, n_cameras=5, w=48, h=32)
    scene = str(tmp_path / "scene")

    def run(resume_at=None, total=8):
        sp = _splat(scene)
        tcfg = TrainConfig(n_iters=total, n_iters_warmup=2, n_iters_test=0,
                           n_save_train_img=0, seed=3, lr=0.01,
                           n_adaptive_control=10 ** 9)
        tr = Trainer(sp, tcfg)
        for i in range(total):
            if resume_at is not None and i == resume_at:
                it = tr.load_full(str(tmp_path / "full.npz"))
                assert it == resume_at
                # rewind host RNG to the same point
                tr.rng = np.random.default_rng(3)
                for _ in range(resume_at):
                    tr.rng.choice(tr.train_split)
            tr.train_step(i)
            if resume_at is None and i == 3:
                tr.save_full(str(tmp_path / "full.npz"), i_iter=4)
        return jax.device_get(tr.state.params)

    p_straight = run(resume_at=None)
    p_resumed = run(resume_at=4)
    for k in p_straight:
        np.testing.assert_array_equal(p_straight[k], p_resumed[k], err_msg=k)
