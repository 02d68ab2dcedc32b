"""Multi-chip sharding utilities.

The reference has no multi-device parallelism at all (SURVEY.md section 2.3:
single-GPU, `rank = 0` stub at train.py:46-48). Here multi-chip is a
first-class citizen, the TPU way: a `jax.sharding.Mesh` over ICI, sharding
annotations, and XLA-inserted collectives.

Supported axes:
  dp — data parallel: training batches (and independent inference streams)
       shard over 'dp'; gradients all-reduce over ICI automatically.

The VO inference state machine is sequential per stream, so multi-stream
batched inference (one stream per chip / per dp shard) is the natural
serving topology; see batched_streams().
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS


def make_mesh(n_devices=None, axis='dp'):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate(mesh):
    return NamedSharding(mesh, PS())


def shard_batch(mesh, axis='dp'):
    return NamedSharding(mesh, PS(axis))


def device_put_sharded_batch(batch, mesh, axis='dp'):
    """Place a dict-of-arrays batch with the leading axis sharded."""
    sh = shard_batch(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
