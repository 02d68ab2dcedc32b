"""Capture bundle_adjust args during the runtime's bootstrap and replay."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np
import jax.numpy as jnp

from test_oracle_ate import H, W, N_FRAMES, make_gt_poses, make_oracle
from dpvo_tpu import ba as ba_mod
from dpvo_tpu import lie
from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.runtime.dpvo import DPVO

cfg = base_cfg.clone()
cfg.BUFFER_SIZE = 64
cfg.PATCHES_PER_FRAME = 4
cfg.PATCH_LIFETIME = 5
cfg.REMOVAL_WINDOW = 10
cfg.OPTIMIZATION_WINDOW = 10
cfg.KEYFRAME_THRESH = -1.0
cfg.MIXED_PRECISION = False

gt_poses = make_gt_poses(N_FRAMES)
oracle = make_oracle(gt_poses)

captured = []
orig_ba = ba_mod.bundle_adjust


def spy_ba(poses, xy, depth, intr, target, weight, lmbda, ii, jj, kk, mask,
           t0, t1, patch_base, **kw):
    captured.append(dict(
        poses=np.asarray(poses), xy=np.asarray(xy), depth=np.asarray(depth),
        intr=np.asarray(intr), target=np.asarray(target),
        weight=np.asarray(weight), ii=np.asarray(ii), jj=np.asarray(jj),
        kk=np.asarray(kk), mask=np.asarray(mask), t0=int(t0), t1=int(t1),
        patch_base=int(patch_base), kw=dict(kw)))
    return orig_ba(poses, xy, depth, intr, target, weight, lmbda, ii, jj,
                   kk, mask, t0, t1, patch_base, **kw)


ba_mod.bundle_adjust = spy_ba
# run update_step EAGERLY (unjitted) so the spy sees concrete arrays; patch
# the name imported into runtime.dpvo, and ba_mod as seen by state.py
import dpvo_tpu.runtime.state as state_mod
import dpvo_tpu.runtime.dpvo as dpvo_mod
state_mod.ba_mod.bundle_adjust = spy_ba
eager_update = state_mod.update_step.__wrapped__  # type: ignore
dpvo_mod.update_step = eager_update

slam = DPVO(cfg, None, ht=H, wd=W, seed=3)
slam._oracle = oracle
slam.motion_probe = lambda: 100.0

rng = np.random.RandomState(1)
intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)
for t in range(8):   # stop after bootstrap; frame_step (jit) must not hit the spy
    img = rng.randint(0, 255, (H, W, 3), np.uint8)
    slam(t, img, intr)

print('captured BA calls:', len(captured))
c = captured[0]
print('t0', c['t0'], 't1', c['t1'], 'pb', c['patch_base'], 'kw', c['kw'],
      'E', len(c['ii']), 'valid', c['mask'].sum())

# sanity: residual of oracle targets at GT poses/depth should be ~0 for the
# captured (ii, jj, kk); here instead REPLAY BA from the captured state 24x
poses = jnp.asarray(c['poses'])
depth = jnp.asarray(c['depth'])
for it in range(24):
    poses, depth = orig_ba(
        poses, jnp.asarray(c['xy']), depth, jnp.asarray(c['intr']),
        jnp.asarray(c['target']), jnp.asarray(c['weight']), 1e-4,
        jnp.asarray(c['ii']), jnp.asarray(c['jj']), jnp.asarray(c['kk']),
        jnp.asarray(c['mask']), jnp.int32(c['t0']), jnp.int32(c['t1']),
        jnp.int32(c['patch_base']), **c['kw'])

est = np.asarray(poses[:8])
gtw = np.asarray(lie.se3_inv(jnp.asarray(gt_poses[:8])))
estw = np.asarray(lie.se3_inv(jnp.asarray(est)))
rel_e = np.linalg.norm(np.diff(estw[:, :3], axis=0), axis=1)
rel_g = np.linalg.norm(np.diff(gtw[:, :3], axis=0), axis=1)
print('replay 24x |t_est|/|t_gt|:', np.round(rel_e / rel_g, 3))
print('replay depth q:', np.round(np.quantile(np.asarray(depth[:32]),
                                              [0.1, 0.5, 0.9]), 3))

# compare the captured target against the oracle evaluated on the captured
# state arrays directly
tgt2, _ = oracle(jnp.asarray(c['poses']), None, None, None,
                 jnp.asarray(c['ii']), jnp.asarray(c['jj']),
                 jnp.asarray(c['kk'])) if False else (None, None)

# ---- A/B: same capture, W=8 vs W=10; and target sanity at GT ----
for Wtry in (8, 10, 16):
    poses = jnp.asarray(c['poses']); depth = jnp.asarray(c['depth'])
    kw = dict(c['kw']); kw['W'] = Wtry
    for it in range(24):
        poses, depth = orig_ba(
            poses, jnp.asarray(c['xy']), depth, jnp.asarray(c['intr']),
            jnp.asarray(c['target']), jnp.asarray(c['weight']), 1e-4,
            jnp.asarray(c['ii']), jnp.asarray(c['jj']), jnp.asarray(c['kk']),
            jnp.asarray(c['mask']), jnp.int32(c['t0']), jnp.int32(c['t1']),
            jnp.int32(c['patch_base']), **kw)
    estw = np.asarray(lie.se3_inv(poses[:8]))
    rel_e = np.linalg.norm(np.diff(estw[:, :3], axis=0), axis=1)
    rel_g = np.linalg.norm(np.diff(gtw[:, :3], axis=0), axis=1)
    print(f'W={Wtry}: ratios', np.round(rel_e/rel_g, 3))

# target sanity: reproject at GT poses + GT depth vs captured target
from dpvo_tpu.runtime.state import _reproject
m = c['mask']
# GT depth for each patch from the plane
frame = np.arange(len(c['depth'])) // 4
xy_c = c['xy'][:, :, ] if False else None
cen = c['xy']          # (N*M, 2, ) wait xy is (N*M, 2) centers? print shape
print('xy shape', c['xy'].shape)

# ---- verify captured targets against oracle recomputed from captured xy ----
valid = c['mask']
ii_, jj_, kk_ = c['ii'][valid], c['jj'][valid], c['kk'][valid]
cen = c['xy'][kk_]
intr_full = np.tile(c['intr'], (64, 1)).astype(np.float32)
gtj = jnp.asarray(gt_poses)
fxi = intr_full[ii_, 0]; fyi = intr_full[ii_, 1]
cxi = intr_full[ii_, 2]; cyi = intr_full[ii_, 3]
rx = (cen[:, 0] - cxi) / fxi; ry = (cen[:, 1] - cyi) / fyi
d_c = np.stack([rx, ry, np.ones_like(rx)], -1)
Pi_inv = np.asarray(lie.se3_inv(gtj[ii_]))
o_w = Pi_inv[:, :3]
d_w = np.asarray(lie.quat_rotate(jnp.asarray(Pi_inv[:, 3:7]), jnp.asarray(d_c)))
from test_oracle_ate import PLANE_Z
lam = (PLANE_Z - o_w[:, 2]) / d_w[:, 2]
X_w = o_w + lam[:, None] * d_w
X_j = np.asarray(lie.se3_act(gtj[jj_], jnp.asarray(X_w)))
tx = intr_full[jj_, 0] * X_j[:, 0] / X_j[:, 2] + intr_full[jj_, 2]
ty = intr_full[jj_, 1] * X_j[:, 1] / X_j[:, 2] + intr_full[jj_, 3]
tgt2 = np.stack([tx, ty], -1)
dt = np.abs(tgt2 - c['target'][valid])
print('target mismatch: max', dt.max(), 'median', np.median(dt))
bad = np.argwhere(dt.max(1) > 0.01).ravel()
print('bad edges:', len(bad), 'of', valid.sum())
if len(bad):
    b0 = bad[0]
    print('ii,jj,kk:', ii_[b0], jj_[b0], kk_[b0], 'cen', cen[b0],
          'tgt_cap', c['target'][valid][b0], 'tgt_re', tgt2[b0])
print('weights captured (valid) min/max:', c['weight'][valid].min(), c['weight'][valid].max())

# ---- convergence depth on captured inputs ----
poses = jnp.asarray(c['poses']); depth = jnp.asarray(c['depth'])
for tot in (12, 48, 96):
    while True:
        poses, depth = orig_ba(
            poses, jnp.asarray(c['xy']), depth, jnp.asarray(c['intr']),
            jnp.asarray(c['target']), jnp.asarray(c['weight']), 1e-4,
            jnp.asarray(c['ii']), jnp.asarray(c['jj']), jnp.asarray(c['kk']),
            jnp.asarray(c['mask']), jnp.int32(c['t0']), jnp.int32(c['t1']),
            jnp.int32(c['patch_base']), **c['kw'])
        tot -= 2
        if tot <= 0:
            break
    estw = np.asarray(lie.se3_inv(poses[:8]))
    rel_e = np.linalg.norm(np.diff(estw[:, :3], axis=0), axis=1)
    rel_g = np.linalg.norm(np.diff(gtw[:, :3], axis=0), axis=1)
    print('cumulative iters ratios:', np.round(rel_e/rel_g, 3), flush=True)

# residual at captured state: how big are r at the captured poses/depth?
from dpvo_tpu.ba import _linearize
r, w, *_ = _linearize(jnp.asarray(c['poses']), jnp.asarray(c['xy']),
                      jnp.asarray(c['depth']), jnp.asarray(c['intr']),
                      jnp.asarray(c['target']), jnp.asarray(c['weight']),
                      jnp.asarray(c['ii']), jnp.asarray(c['jj']),
                      jnp.asarray(c['kk']), jnp.asarray(c['mask']))
rn = np.linalg.norm(np.asarray(r), axis=-1)[c['mask']]
wn = np.asarray(w)[c['mask']]
print('residuals at capture: q50/q90/max', np.round(np.quantile(rn, [0.5, 0.9, 1.0]), 2))
print('gated-out edges (w=0):', int((wn.max(1) == 0).sum()), 'of', int(c['mask'].sum()))
