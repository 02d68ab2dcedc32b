"""A/B the one-pass fused corr kernel vs plane-kernel + select at the
production shape (640x480 default config: E = GP*M = 49152).

Run ON TPU:  python scripts/micro_onepass.py
Env: E, NV (valid edges), ITERS.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops.corr_fused import corr_fused, pad_slab, pad_slab2
from dpvo_tpu.ops.corr_onepass import corr_onepass, pad_slab1pair

E = int(os.environ.get('E', 49152))
NV = int(os.environ.get('NV', E))
ITERS = int(os.environ.get('ITERS', 10))
H1, W1 = 120, 160          # 640x480 feature scale
F, P, C, M = 36, 3, 128, 96

rng = np.random.RandomState(0)
gmap = jnp.asarray(rng.randn(F * M, P, P, C), jnp.bfloat16)
f1 = jnp.asarray(rng.randn(F, H1, W1, C), jnp.bfloat16)
f2 = jnp.asarray(rng.randn(F, H1 // 4, W1 // 4, C), jnp.bfloat16)
fp1 = pad_slab(f1)             # corr_fused single-phase L1 slab
fp1p = pad_slab1pair(f1)       # corr_onepass L1 phase pair
fp2 = pad_slab2(f2)

cx = rng.uniform(8, W1 - 9, E)
cy = rng.uniform(8, H1 - 9, E)
off = np.linspace(-1.0, 1.0, P)
coords = np.stack([
    cx[:, None, None] + off[None, None, :] + rng.uniform(-0.3, 0.3, (E, P, P)),
    cy[:, None, None] + off[None, :, None] + rng.uniform(-0.3, 0.3, (E, P, P)),
], -1).astype(np.float32)
coords = jnp.asarray(coords)
kk = jnp.asarray(rng.randint(0, F * M, E), jnp.int32)
jj = jnp.asarray(np.sort(rng.randint(0, 22, E)), jnp.int32)
nv = jnp.asarray(NV, jnp.int32)
prep = ((H1, W1), (H1 // 4, W1 // 4))
# the pipeline gathers g9 at PAIR granularity outside the kernel
# (device_vo.py corr_two_level); a per-edge 49k-row gather inside the timed
# region costs ~500 ms on TPU (row gathers lower to sequential loops) and
# swamps the kernel being measured.
g9 = jnp.asarray(np.asarray(gmap).reshape(F * M, P * P, C)[np.asarray(kk)])
jax.block_until_ready(g9)


def bench(label, fn, *args, **kw):
    f = jax.jit(lambda *a: fn(*a, **kw))

    def fence(o):
        # value fetch = true completion fence on axon, but fetch ONE element:
        # np.asarray pulls the whole 87 MB c1 over the tunnel (~400 ms,
        # swamping the 12 ms kernel being measured)
        return float(o[0][(0,) * o[0].ndim])
    try:
        out = f(*args)
        jax.block_until_ready(out)
        _ = fence(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(*args)
        _ = fence(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f'{label:28s}: {dt*1e3:8.2f} ms ({dt/E*1e9:6.1f} ns/edge)',
              flush=True)
    except Exception as ex:
        print(f'{label:28s}: FAILED {str(ex)[:160]}', flush=True)


print(f'backend={jax.default_backend()} E={E} NV={NV}', flush=True)
bench('fused + select kernel', corr_fused, gmap, fp1, fp2, coords, kk, jj,
      prepadded=prep, select_kernel=True, g9=g9)
bench('fused + XLA select', corr_fused, gmap, fp1, fp2, coords, kk, jj,
      prepadded=prep, select_kernel=False, g9=g9)
bench('onepass (nv=E)', corr_onepass, gmap, fp1p, fp2, coords, kk, jj,
      prepadded=prep, g9=g9)
bench('onepass (nv)', corr_onepass, gmap, fp1p, fp2, coords, kk, jj,
      prepadded=prep, nv=nv, g9=g9)
bench('onepass native (nv=E)', corr_onepass, gmap, fp1p, fp2, coords, kk,
      jj, prepadded=prep, g9=g9, layout='native')

# production path: pair-blocked contiguous kk rows -> in-kernel g-row DMA
# straight from gmap (device_vo corr_two_level), bf16 taps out
GP = E // M
psl = rng.randint(0, F, GP)
kk_cont = jnp.asarray(
    (psl[:, None] * M + np.arange(M)[None, :]).reshape(E), jnp.int32)
bench('onepass native contiguous', corr_onepass, gmap, fp1p, fp2, coords,
      kk_cont, jj, prepadded=prep, layout='native',
      out_dtype=jnp.bfloat16, rows_contiguous=True)
bench('onepass native cont f32', corr_onepass, gmap, fp1p, fp2, coords,
      kk_cont, jj, prepadded=prep, layout='native', rows_contiguous=True)
