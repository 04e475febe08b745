"""Host-side stage timing around device work.

TPU analogue of the reference's CUDA-event ``Timer`` (``utils.py:357-389``):
a context manager that blocks on the produced arrays and accumulates per-stage
intervals in a class-level recorder, plus a hook into ``jax.profiler`` traces
for deep dives.
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax
import numpy as np


class StageTimer:
    recorder = defaultdict(list)

    def __init__(self, des: str = "", debug: bool = True, sync=None):
        self.des = des
        self.debug = debug
        self._sync = sync  # array/pytree to block on at exit

    def __enter__(self):
        if self.debug:
            self.start = time.perf_counter()
        return self

    def set_sync(self, value):
        self._sync = value
        return value

    def __exit__(self, *exc):
        if not self.debug:
            return
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.interval = time.perf_counter() - self.start
        StageTimer.recorder[self.des].append(self.interval)

    @classmethod
    def show_recorder(cls):
        from pprint import pprint

        pprint({k: float(np.mean(v)) for k, v in cls.recorder.items()})

    @classmethod
    def reset(cls):
        cls.recorder = defaultdict(list)


class trace_if:
    """``with trace_if(path):`` starts a jax.profiler trace when path given."""

    def __init__(self, trace_dir=None):
        self.trace_dir = trace_dir

    def __enter__(self):
        if self.trace_dir:
            jax.profiler.start_trace(self.trace_dir)
        return self

    def __exit__(self, *exc):
        if self.trace_dir:
            jax.profiler.stop_trace()
