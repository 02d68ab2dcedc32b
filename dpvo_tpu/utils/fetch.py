"""Device->host fetch that never blocks the tunnel on a PENDING array.

Measured on the axon TPU tunnel: np.asarray on an array whose computation
is still in flight takes 60+ ms (pathological cases far worse — the
blocking sync path serializes the whole stream), while fetching a READY
array costs ~1 ms. Polling jax.Array.is_ready() (non-blocking) until the
value lands, then fetching, costs device-compute-time + ~1 ms.
"""
from __future__ import annotations

import time

import numpy as np


def fetch(x, poll_s=0.0005):
    """np.asarray(x) with poll-until-ready semantics (read-only view)."""
    is_ready = getattr(x, 'is_ready', None)
    if is_ready is not None:
        while not x.is_ready():
            time.sleep(poll_s)
    return np.asarray(x)


def fetch_copy(x, poll_s=0.0005):
    """Like fetch() but returns a writable copy."""
    return np.array(fetch(x, poll_s))
