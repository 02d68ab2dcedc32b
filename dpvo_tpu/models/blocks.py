"""Network building blocks: linears, layer norm, gated residual, SoftAgg.

TPU-native rewrite of dpvo/blocks.py:7-118. Functional, flat params dict
keyed by torch state_dict names. Matmuls run in the input dtype (bf16 under
mixed precision) with fp32 accumulation; LayerNorm statistics in fp32 with
the reference's eps=1e-3 (dpvo/net.py:41).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scatter import segment_softmax, segment_sum


def linear(params, name, x):
    w = params[name + '.weight']        # stored (in, out) — see checkpoint.py
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.matmul(x, w.astype(x.dtype), precision=prec)
    b = params.get(name + '.bias')
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def layer_norm(params, name, x, eps=1e-3):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params[name + '.weight'].astype(jnp.float32) + \
        params[name + '.bias'].astype(jnp.float32)
    return y.astype(x.dtype)


def mlp2(params, name0, name2, x):
    """Sequential(Linear, ReLU, Linear) — the c1/c2/res pattern."""
    return linear(params, name2, jax.nn.relu(linear(params, name0, x)))


def linear2(params, name_a, name_b, x):
    """Two linears over the SAME input as one wider GEMM.

    Numerically identical to two separate matmuls (output columns are
    independent; the K-dim accumulation order is unchanged) but reads the
    (E, D) activation once instead of twice — the update operator is
    memory-bound between GEMMs. Returns (out_a, out_b)."""
    wa = params[name_a + '.weight']
    wb = params[name_b + '.weight']
    w = jnp.concatenate([wa, wb], axis=1).astype(x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.matmul(x, w, precision=prec)
    da = wa.shape[1]
    oa, ob = out[..., :da], out[..., da:]
    ba = params.get(name_a + '.bias')
    bb = params.get(name_b + '.bias')
    if ba is not None:
        oa = oa + ba.astype(x.dtype)
    if bb is not None:
        ob = ob + bb.astype(x.dtype)
    return oa, ob


def gated_residual(params, prefix, x):
    """x + sigmoid(gate(x)) * res(x)  (dpvo/blocks.py:15-29)."""
    g0, r0 = linear2(params, prefix + '.gate.0', prefix + '.res.0', x)
    gate = jax.nn.sigmoid(g0)
    res = linear(params, prefix + '.res.2', jax.nn.relu(r0))
    return x + gate * res


def soft_agg(params, prefix, x, ids, num_segments, mask=None):
    """Softmax-weighted aggregation by group id, re-expanded to edges.

    Mirrors SoftAgg (dpvo/blocks.py:31-48): w = scatter_softmax(g(x), ids);
    y = scatter_sum(f(x) * w, ids); return h(y)[ids]. `ids` must be a dense
    relabeling of the original group keys (computed host-side, replacing the
    device-side torch.unique).
    """
    fx, gx = linear2(params, prefix + '.f', prefix + '.g', x)
    gx = gx.astype(jnp.float32)
    w = segment_softmax(gx, ids, num_segments, mask=mask)
    y = segment_sum(fx.astype(jnp.float32) * w, ids, num_segments)
    hy = linear(params, prefix + '.h', y.astype(x.dtype))
    return hy[ids]


def soft_agg_ij_pairs(params, prefix, x3, mask3):
    """SoftAgg over frame-pair groups when edges arrive PAIR-BLOCKED.

    x3 (GP, M, D); mask3 (GP, M) valid edges. The pair id of edge (g, m)
    is g, so the segment softmax collapses to a masked softmax over the M
    axis and the scatter-sum to a plain sum — ZERO scatter/gather ops
    (same math as soft_agg with ids=repeat(arange(GP), M))."""
    GP, M, D = x3.shape
    flat = x3.reshape(GP * M, D)
    fx, gx = linear2(params, prefix + '.f', prefix + '.g', flat)
    fx = fx.reshape(GP, M, D)
    # softmax in the edge dtype (bf16 under MIXED_PRECISION, like the
    # reference's autocast-half scatter_softmax, net.py:87-88): max-
    # subtracted exp args are <= 0, so bf16 is stable; the M-axis SUM
    # accumulates in f32. Halves the (GP, M, D) softmax traffic
    # (~0.4 ms/frame at the 640x480 default).
    dt = x3.dtype
    gx = gx.astype(dt).reshape(GP, M, D)
    gxm = jnp.where(mask3[..., None], gx, -jnp.inf)
    mx = jnp.max(gxm, axis=1, keepdims=True)
    ex = jnp.exp(gxm - jnp.where(jnp.isfinite(mx), mx, 0.0))
    ex = jnp.where(mask3[..., None], ex, 0.0)
    den = jnp.sum(ex, axis=1, keepdims=True, dtype=jnp.float32)
    w = ex / jnp.maximum(den, 1e-30).astype(dt)
    y = (fx * w).sum(axis=1, dtype=jnp.float32)               # (GP, D)
    hy = linear(params, prefix + '.h', y.astype(x3.dtype))
    return jnp.broadcast_to(hy[:, None], (GP, M, D)).reshape(GP * M, D)


def soft_agg_kk_pairs(params, prefix, x3, psl, mask3, num_slots):
    """SoftAgg over source-patch groups when edges arrive PAIR-BLOCKED.

    Edge (g, m)'s patch group is (psl[g], m) — pairs sharing a source
    frame share groups. Scatter/gather run at PAIR granularity (GP rows of
    M*D) instead of E fine-grained rows: TPU row ops at 512×(M·D) instead
    of 49k×D (fine-grained gathers lower to serial loops on TPU).

    x3 (GP, M, D); psl (GP,) source slot per pair; mask3 (GP, M);
    num_slots: static slot count (pmem)."""
    GP, M, D = x3.shape
    flat = x3.reshape(GP * M, D)
    fx, gx = linear2(params, prefix + '.f', prefix + '.g', flat)
    fx = fx.reshape(GP, M, D)
    # softmax in the edge dtype (bf16 under MIXED_PRECISION — the
    # reference autocasts its scatter_softmax to half, net.py:87-88);
    # the slot-level max/sum ACCUMULATORS stay f32 (they are only
    # (num_slots, M, D), ~14x smaller than the edge tensors)
    dt = x3.dtype
    gx = gx.astype(dt).reshape(GP, M, D)
    neg = jnp.asarray(-1e30, dt)              # representable in bf16
    gxm = jnp.where(mask3[..., None], gx, neg)

    mx = jnp.full((num_slots, M, D), neg).at[psl].max(gxm, mode='drop')
    ex = jnp.exp(gxm - mx[psl])
    ex = jnp.where(mask3[..., None], ex, 0.0)
    # slot-sums as one-hot MXU matmuls contracting the pair axis: the
    # scatter-add form materializes two (GP, M, D) f32 convert temporaries
    # (~75 MB each) before the scatter (~0.7 ms/frame at the 640x480
    # default); the MXU reads the bf16 edge tensors directly and
    # accumulates in f32 — same math (each product is an exact bf16 value
    # times 1.0), out-of-range psl rows match no slot (== mode='drop')
    oh = (psl[:, None] == jnp.arange(num_slots, dtype=psl.dtype)[None, :]
          ).astype(dt)
    dnum = (((0,), (0,)), ((), ()))               # contract the GP axis

    den = jax.lax.dot_general(oh, ex.reshape(GP, M * D), dnum,
                              preferred_element_type=jnp.float32
                              ).reshape(num_slots, M, D)
    w = ex / jnp.maximum(den[psl], 1e-30).astype(dt)

    y = jax.lax.dot_general(oh, (fx * w).reshape(GP, M * D), dnum,
                            preferred_element_type=jnp.float32
                            ).reshape(num_slots, M, D)
    hy = linear(params, prefix + '.h',
                y.reshape(num_slots * M, D).astype(x3.dtype))
    return hy.reshape(num_slots, M, D)[psl].reshape(GP * M, D)


# ---------------------------------------------------------------------------
# gradient clamps (reference dpvo/blocks.py:70-107) — identity forward,
# clipped/zeroed backward; used on the update heads during training
# ---------------------------------------------------------------------------

GRAD_CLIP = 0.1


@jax.custom_vjp
def grad_clip(x):
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


grad_clip.defvjp(_gc_fwd, _gc_bwd)


@jax.custom_vjp
def grad_zero(x):
    return x


def _gz_fwd(x):
    return x, None


def _gz_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    g = jnp.where(jnp.abs(g) > GRAD_CLIP, 0.0, g)
    return (g,)


grad_zero.defvjp(_gz_fwd, _gz_bwd)


# ---------------------------------------------------------------------------
# initialization helpers (torch nn.Linear default init)
# ---------------------------------------------------------------------------

def init_linear(rng, p, name, fan_in, fan_out, bias=True):
    bound = 1.0 / np.sqrt(fan_in)
    p[name + '.weight'] = rng.uniform(
        -bound, bound, (fan_in, fan_out)).astype(np.float32)
    if bias:
        p[name + '.bias'] = rng.uniform(-bound, bound, fan_out).astype(np.float32)


def init_layer_norm(p, name, dim):
    p[name + '.weight'] = np.ones(dim, np.float32)
    p[name + '.bias'] = np.zeros(dim, np.float32)
