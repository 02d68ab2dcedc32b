"""Wall-clock section timing around device work.

TPU equivalent of the reference's CUDA-event Timer (dpvo/utils.py:8-29):
`jax.block_until_ready` walls instead of cudaEvent pairs. For deep kernel
profiles use `jax.profiler.trace` (see bench.py --profile).
"""
from __future__ import annotations

import time
from contextlib import ContextDecorator

import jax

all_times = []


class Timer(ContextDecorator):
    def __init__(self, name, enabled=True, sync=None):
        self.name = name
        self.enabled = enabled
        self.sync = sync  # optional array/pytree to block on at exit

    def __enter__(self):
        if self.enabled:
            self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            if self.sync is not None:
                jax.block_until_ready(self.sync)
            elapsed = (time.perf_counter() - self.start) * 1000.0
            all_times.append(elapsed)
            print(f'{self.name} {elapsed:.03f}')
        return False
