"""Ablate the one-pass kernel: dots-only vs epilogue-only vs full.

Monkeypatches corr_onepass internals BEFORE first trace.  Run ON TPU.
Env: E, ITERS.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import dpvo_tpu.ops.corr_onepass as op
from dpvo_tpu.ops.corr_fused import pad_slab2
from dpvo_tpu.ops.corr_onepass import pad_slab1pair

E = int(os.environ.get('E', 49152))
ITERS = int(os.environ.get('ITERS', 20))
MODE = os.environ.get('MODE', 'full')      # full | dots | epilogue
H1, W1 = 120, 160
F, P, C, M = 36, 3, 128, 96

if MODE == 'epilogue':
    # body writes nothing: epilogue reads stale scratch
    _orig_kernel = op._onepass_kernel
    import functools
    def _no_dots(*refs, **kw):
        # rebuild kernel with fori_loop body neutered by masking nv to 0 in
        # the dot gate only -- easiest: monkeypatch dot_general to zeros of
        # right shape is invasive; instead patch fori_loop used in module
        raise SystemExit('use DOTS=0 path below')
if MODE in ('dots', 'dotsonly'):
    d = 7
    def _zero_select(plane, sel, fy, fx, vrow, *, H, W, Wy, Wx, radius):
        R = plane.shape[0]
        # keep a data dependence on the planes so the dots are not DCE'd
        return jnp.zeros((R, d * Wx), jnp.float32) + plane[:, :1] * 0.0 \
            + jnp.zeros((R, d * Wx), jnp.float32)
    op._select_flat = _zero_select
if MODE == 'dotsonly':
    # also stub the tap compaction: isolates dot loop + out writes + gating
    def _zero_compact(w, Wx, radius):
        d = 2 * radius + 1
        return jnp.zeros((w.shape[0], d * d), jnp.float32) + w[:, :1] * 0.0
    op._compact_taps = _zero_compact

rng = np.random.RandomState(0)
gmap = jnp.asarray(rng.randn(F * M, P, P, C), jnp.bfloat16)
f1 = jnp.asarray(rng.randn(F, H1, W1, C), jnp.bfloat16)
f2 = jnp.asarray(rng.randn(F, H1 // 4, W1 // 4, C), jnp.bfloat16)
fp1 = pad_slab1pair(f1)
fp2 = pad_slab2(f2)
cx = rng.uniform(8, W1 - 9, E)
cy = rng.uniform(8, H1 - 9, E)
off = np.linspace(-1.0, 1.0, P)
coords = np.stack([
    cx[:, None, None] + off[None, None, :] + rng.uniform(-0.3, 0.3, (E, P, P)),
    cy[:, None, None] + off[None, :, None] + rng.uniform(-0.3, 0.3, (E, P, P)),
], -1).astype(np.float32)
coords = jnp.asarray(coords)
kk = np.asarray(rng.randint(0, F * M, E), np.int32)
jj = jnp.asarray(np.sort(rng.randint(0, 22, E)), jnp.int32)
g9 = jnp.asarray(np.asarray(gmap).reshape(F * M, P * P, C)[kk])
kk = jnp.asarray(kk)
prep = ((H1, W1), (H1 // 4, W1 // 4))

f = jax.jit(lambda *a: op.corr_onepass(*a, prepadded=prep, g9=g9))
out = f(gmap, fp1, fp2, coords, kk, jj)
jax.block_until_ready(out)
_ = float(out[0][0, 0, 0, 0, 0])
t0 = time.perf_counter()
for _ in range(ITERS):
    out = f(gmap, fp1, fp2, coords, kk, jj)
_ = float(out[0][0, 0, 0, 0, 0])
dt = (time.perf_counter() - t0) / ITERS
print(f'{MODE:10s}: {dt*1e3:8.2f} ms ({dt/E*1e9:6.1f} ns/edge)', flush=True)
