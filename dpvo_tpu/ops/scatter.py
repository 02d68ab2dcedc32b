"""Segment scatter ops — TPU-native torch_scatter replacements.

The reference uses torch_scatter (scatter_softmax / scatter_sum) inside
SoftAgg (dpvo/blocks.py:31-48) and the training BA (dpvo/ba.py:40-56).
On TPU these map onto `jax.ops.segment_*` which XLA lowers to sorted/unsorted
scatter; group ids are precomputed host-side so the device never needs a
`unique` (dynamic-shape) op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(x, ids, num_segments):
    return jax.ops.segment_sum(x, ids, num_segments=num_segments)


def segment_mean(x, ids, num_segments):
    s = jax.ops.segment_sum(x, ids, num_segments=num_segments)
    c = jax.ops.segment_sum(jnp.ones(x.shape[:1], x.dtype), ids,
                            num_segments=num_segments)
    return s / jnp.maximum(c, 1.0)[(...,) + (None,) * (x.ndim - 1)]


def segment_softmax(x, ids, num_segments, mask=None):
    """Softmax over rows sharing a segment id (torch_scatter.scatter_softmax).

    x: (E, D); ids: (E,) int; mask: optional (E,) bool — masked rows get
    weight zero and do not influence their segment's normalization.
    """
    if mask is not None:
        x = jnp.where(mask[:, None], x, -jnp.inf)
    m = jax.ops.segment_max(x, ids, num_segments=num_segments)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    ex = jnp.exp(x - m[ids])
    if mask is not None:
        ex = jnp.where(mask[:, None], ex, 0.0)
    denom = jax.ops.segment_sum(ex, ids, num_segments=num_segments)
    return ex / jnp.maximum(denom[ids], 1e-12)
