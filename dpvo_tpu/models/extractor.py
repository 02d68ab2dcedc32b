"""RAFT-style residual CNN feature encoders (BasicEncoder4).

TPU-native rewrite of the reference dpvo/extractor.py:200-264. Functional:
parameters live in a flat dict keyed by the *torch state_dict names* (e.g.
"fnet.layer2.0.downsample.0.weight") so checkpoint conversion is a mechanical
per-tensor transpose (see models/checkpoint.py). Layout is NHWC / HWIO — the
native TPU convolution layout — with bf16 params and fp32 accumulation.

BasicEncoder4 = 7x7 s2 conv -> [2 residual blocks @32ch] ->
[2 residual blocks @64ch, first s2] -> 1x1 conv; output stride 4.
norm_fn: 'instance' (fnet) or 'none' (inet) — neither carries parameters.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

DIM = 32  # base channel count (reference extractor.py:115)


def conv2d(params, name, x, stride=1):
    """Same-dtype conv (bf16 in/out under mixed precision; the TPU MXU
    accumulates bf16 contractions in fp32 natively, so no explicit
    preferred_element_type is needed — and keeping one dtype keeps the
    transpose-conv backward pass type-consistent).

    Padding is explicit symmetric k//2 like torch Conv2d(padding=k//2) —
    XLA 'SAME' pads asymmetrically under stride 2 and would shift taps.
    """
    w = params[name + '.weight']
    p = w.shape[0] // 2
    # f32 path = faithful (checkpoint parity); bf16 path = fast MXU
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=prec,
    )
    b = params.get(name + '.bias')
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def instance_norm(x, eps=1e-5):
    """Per-sample per-channel normalization over H, W (no affine)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(-3, -2), keepdims=True)
    var = x32.var(axis=(-3, -2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _residual_block(params, prefix, x, norm_fn, stride):
    y = conv2d(params, prefix + '.conv1', x, stride=stride)
    if norm_fn == 'instance':
        y = instance_norm(y)
    y = jax.nn.relu(y)
    y = conv2d(params, prefix + '.conv2', y, stride=1)
    if norm_fn == 'instance':
        y = instance_norm(y)
    y = jax.nn.relu(y)
    if stride != 1:
        x = conv2d(params, prefix + '.downsample.0', x, stride=stride)
        if norm_fn == 'instance':
            x = instance_norm(x)
    return jax.nn.relu(x + y)


def basic_encoder4(params, prefix, x, norm_fn):
    """x: (N, H, W, 3) -> (N, H/4, W/4, output_dim)."""
    x = conv2d(params, prefix + '.conv1', x, stride=2)
    if norm_fn == 'instance':
        x = instance_norm(x)
    x = jax.nn.relu(x)
    x = _residual_block(params, prefix + '.layer1.0', x, norm_fn, 1)
    x = _residual_block(params, prefix + '.layer1.1', x, norm_fn, 1)
    x = _residual_block(params, prefix + '.layer2.0', x, norm_fn, 2)
    x = _residual_block(params, prefix + '.layer2.1', x, norm_fn, 1)
    x = conv2d(params, prefix + '.conv2', x, stride=1)
    return x


def _split_instance_norm(x, c):
    """Instance-normalize channels [:c] only (fnet half of a fused pass)."""
    return jnp.concatenate([instance_norm(x[..., :c]), x[..., c:]], axis=-1)


def _fused_w(params, pa, pb, name, diag):
    """Fuse two same-shaped convs: concat on O; block-diagonal on (I, O)
    when `diag` (inner layers whose inputs are already the fused stream)."""
    wa = params[f'{pa}.{name}.weight']
    wb = params[f'{pb}.{name}.weight']
    if not diag:
        w = jnp.concatenate([wa, wb], axis=-1)
    else:
        kh, kw, i, o = wa.shape
        ib, ob = wb.shape[2], wb.shape[3]
        w = jnp.zeros((kh, kw, i + ib, o + ob), wa.dtype)
        w = w.at[:, :, :i, :o].set(wa).at[:, :, i:, o:].set(wb)
    b = jnp.concatenate([params[f'{pa}.{name}.bias'],
                         params[f'{pb}.{name}.bias']])
    return {f'f.{name}.weight': w, f'f.{name}.bias': b}


def basic_encoder4_fused(params, pa, pb, x):
    """Run TWO BasicEncoder4 nets (`pa` with instance norm, `pb` without)
    as ONE conv stack with concatenated/block-diagonal weights.

    Bitwise-equivalent to two separate passes (the off-diagonal zeros add
    exact 0 to every accumulator; the instance norm applies to the `pa`
    channel half only), but at 32/64 channels the MXU pads lanes to the
    tile anyway, so one fused pass costs about half the device time of two
    — this is the patchify hot path (reference runs fnet+inet separately,
    net.py:112-113).

    Returns (ya, yb): (N, H/4, W/4, out_a), (N, H/4, W/4, out_b).
    """
    fp = {}
    for name, diag in (('conv1', False),
                       ('layer1.0.conv1', True), ('layer1.0.conv2', True),
                       ('layer1.1.conv1', True), ('layer1.1.conv2', True),
                       ('layer2.0.conv1', True), ('layer2.0.conv2', True),
                       ('layer2.0.downsample.0', True),
                       ('layer2.1.conv1', True), ('layer2.1.conv2', True),
                       ('conv2', True)):
        fp.update(_fused_w(params, pa, pb, name, diag))

    c1 = params[f'{pa}.conv1.weight'].shape[-1]        # fnet half width
    c2 = 2 * c1
    out_a = params[f'{pa}.conv2.weight'].shape[-1]

    x = conv2d(fp, 'f.conv1', x, stride=2)
    x = jax.nn.relu(_split_instance_norm(x, c1))

    def block(x, prefix, c, stride):
        y = conv2d(fp, prefix + '.conv1', x, stride=stride)
        y = jax.nn.relu(_split_instance_norm(y, c))
        y = conv2d(fp, prefix + '.conv2', y, stride=1)
        y = jax.nn.relu(_split_instance_norm(y, c))
        if stride != 1:
            x = conv2d(fp, prefix + '.downsample.0', x, stride=stride)
            x = _split_instance_norm(x, c)
        return jax.nn.relu(x + y)

    x = block(x, 'f.layer1.0', c1, 1)
    x = block(x, 'f.layer1.1', c1, 1)
    x = block(x, 'f.layer2.0', c2, 2)
    x = block(x, 'f.layer2.1', c2, 1)
    x = conv2d(fp, 'f.conv2', x, stride=1)
    return x[..., :out_a], x[..., out_a:]


def basic_encoder(params, prefix, x, norm_fn):
    """Stride-8 BasicEncoder (reference extractor.py:117-197 — defined by the
    reference but unused by VONet; provided for parity).

    x: (N, H, W, 3) -> (N, H/8, W/8, output_dim)."""
    x = conv2d(params, prefix + '.conv1', x, stride=2)
    if norm_fn == 'instance':
        x = instance_norm(x)
    x = jax.nn.relu(x)
    x = _residual_block(params, prefix + '.layer1.0', x, norm_fn, 1)
    x = _residual_block(params, prefix + '.layer1.1', x, norm_fn, 1)
    x = _residual_block(params, prefix + '.layer2.0', x, norm_fn, 2)
    x = _residual_block(params, prefix + '.layer2.1', x, norm_fn, 1)
    x = _residual_block(params, prefix + '.layer3.0', x, norm_fn, 2)
    x = _residual_block(params, prefix + '.layer3.1', x, norm_fn, 1)
    x = conv2d(params, prefix + '.conv2', x, stride=1)
    return x


# ---------------------------------------------------------------------------
# initialization (kaiming-normal convs, reference extractor.py:233-240)
# ---------------------------------------------------------------------------

def _kaiming(rng, shape_oihw):
    o, i, kh, kw = shape_oihw
    fan_out = o * kh * kw
    std = math.sqrt(2.0 / fan_out)
    w = rng.randn(kh, kw, i, o).astype(np.float32) * std
    return w


def init_encoder_params(rng, prefix, output_dim):
    """Random init with the same names/shapes a torch checkpoint provides."""
    p = {}

    def add_conv(name, o, i, k):
        p[name + '.weight'] = _kaiming(rng, (o, i, k, k))
        p[name + '.bias'] = np.zeros(o, np.float32)

    add_conv(prefix + '.conv1', DIM, 3, 7)
    for li, (cin, cout, stride) in enumerate(
            [(DIM, DIM, 1), (DIM, 2 * DIM, 2)]):
        name = f'{prefix}.layer{li + 1}'
        add_conv(name + '.0.conv1', cout, cin, 3)
        add_conv(name + '.0.conv2', cout, cout, 3)
        if stride != 1:
            add_conv(name + '.0.downsample.0', cout, cin, 1)
        add_conv(name + '.1.conv1', cout, cout, 3)
        add_conv(name + '.1.conv2', cout, cout, 3)
    add_conv(prefix + '.conv2', output_dim, 2 * DIM, 1)
    return p
