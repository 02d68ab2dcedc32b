"""Host wrapper for the device-resident VO runtime.

Per frame: one H2D (image + patch seeds) and ONE dispatch — no readback
until terminate(). Used automatically by DPVO for pure-VO configs; the
loop-closure backends run on the hybrid runtime (runtime/dpvo.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.vonet import DIM, P, RES, VONetParams, init_vonet_params
from ..models.checkpoint import load_network
from . import numpy_se3 as nse3
from ..utils.fetch import fetch
from .centroid import select_coords
from .device_vo import init_state, vo_frame, _gp_cap


def _pick_corr_impl(ht=480, wd=640):
    """Select the correlation implementation OUTSIDE any jit trace.

    Pre-flighting inside a trace would concretization-fail and silently
    poison the cached availability flag; deciding here (driver init) keeps
    the static jit arg honest.  Pre-flights at the caller's FEATURE-MAP
    resolution (ht//4, wd//4): kernel viability (scoped-vmem budget) is
    shape-dependent. DPVO_CORR_IMPL overrides for A/B benching
    ('onepass' | 'fused_k' | 'fused')."""
    import os
    forced = os.environ.get('DPVO_CORR_IMPL', '')
    if forced in ('onepass', 'fused_k', 'fused'):
        return forced
    if jax.default_backend() not in ('tpu', 'axon'):
        return 'fused'
    from ..ops.corr_onepass import kernel_available as _onepass_ok
    if _onepass_ok(ht // 4, wd // 4):
        return 'onepass'
    from ..ops.corr_select import kernel_available as _select_ok
    return 'fused_k' if _select_ok() else 'fused'


class DeviceVO:
    """Same public surface as DPVO (construct / __call__ / terminate)."""

    def __init__(self, cfg, network, ht=480, wd=640, viz=False, seed=1234):
        self.cfg = cfg
        self.ht, self.wd = ht, wd
        self.M = cfg.PATCHES_PER_FRAME
        self.rng = np.random.RandomState(seed)
        self.P, self.RES, self.DIM = P, RES, DIM

        from .dpvo import DPVO as _HybridVO
        _HybridVO.load_weights(self, network)   # sets self.params

        from .device_vo import ring_capacity
        _pm = ring_capacity(cfg)
        self._static = dict(
            M=self.M, pmem=_pm, mem=_pm,
            W=cfg.OPTIMIZATION_WINDOW,
            PCF=cfg.REMOVAL_WINDOW + 4,
            r=cfg.PATCH_LIFETIME,
            kf_index=cfg.KEYFRAME_INDEX,
            opt_window=cfg.OPTIMIZATION_WINDOW,
            removal_window=cfg.REMOVAL_WINDOW,
            kf_thresh=float(cfg.KEYFRAME_THRESH),
            motion_damping=float(cfg.MOTION_DAMPING),
            motion_model=cfg.MOTION_MODEL,
            mixed_precision=bool(cfg.MIXED_PRECISION),
            corr_impl=_pick_corr_impl(ht, wd),
        )
        # camera-native I420 ingest (1.5 B/px over the host->device link
        # instead of 3; device-side BT.601 conversion) — opt-in via config
        self._upload = str(getattr(cfg, 'UPLOAD_FORMAT', 'rgb')).lower()
        if self._upload == 'yuv420' and (ht % 2 or wd % 2):
            print(f'WARNING: UPLOAD_FORMAT=yuv420 needs even dims, got '
                  f'{ht}x{wd}; falling back to rgb ingest')
            self._upload = 'rgb'                  # I420 needs even dims
        if self._static['corr_impl'] == 'onepass':
            # the one-pass kernel feeds corr features in its NATIVE channel
            # order (no relayout transposes); fold the fixed permutation
            # into update.corr.0's weight rows once, host-side
            from ..models.vonet import permute_params_for_native_corr
            self.params = permute_params_for_native_corr(self.params)
        self.st = None
        self.tlist = []
        # optional ground-truth target oracle (static callable; same contract
        # as HybridVO._oracle / runtime/state.py:update_step) — drives the
        # real device-resident pipeline in accuracy tests. Set force_accept
        # in _static too: the learned motion probe is meaningless with it.
        self._oracle = None
        self.viewer = None
        if viz:
            try:
                from ..viz.viewer import Viewer
                self.viewer = Viewer()
            except Exception as e:
                print(f'WARNING: viewer unavailable: {e}')
        # lazy keyframe-count guard state (see __call__)
        self._last_n = 0
        self._since_check = 0

    def __call__(self, tstamp, image, intrinsics):
        if self.st is None:
            self.st = init_state(self.cfg, self.ht, self.wd, intrinsics,
                                 self._static['corr_impl'])

        from .device_vo import CNT_CAP
        if len(self.tlist) + 1 >= CNT_CAP:
            raise Exception('input frame capacity exceeded; raise '
                            'device_vo.CNT_CAP')

        # BUFFER_SIZE bounds KEYFRAMES, not input frames (reference
        # dpvo.py:383-384 guards on self.n). The keyframe count st.n lives
        # on device; read it back only when the worst case — every frame
        # since the last check accepted as a keyframe — could overflow the
        # buffer. Amortized: zero readbacks until input count nears
        # BUFFER_SIZE, then one scalar D2H per ~(N - n) frames.
        self._since_check += 1
        if self._last_n + self._since_check + 2 >= self.cfg.BUFFER_SIZE:
            self._last_n = int(fetch(self.st.n))
            self._since_check = 0
            if self._last_n + 2 >= self.cfg.BUFFER_SIZE:
                raise Exception(
                    f'The buffer size is too small. You can increase it '
                    f'using "--opts BUFFER_SIZE={self.cfg.BUFFER_SIZE * 2}"')

        self.tlist.append(tstamp)
        from .device_vo import vo_frame_packed1
        self.st = vo_frame_packed1(
            self.params, self.st, jnp.asarray(self._pack_buf(image, tstamp)),
            ht=self.ht, wd=self.wd, upload=self._upload,
            oracle=self._oracle, **self._static)

        if self.viewer is not None:
            self.viewer.update_image(image)
            # each snapshot costs one readback (~100 ms on the attach path);
            # viz mode trades FPS for the live view, like --viz upstream
            if len(self.tlist) % 10 == 0:
                self._push_viewer_state()

    def _select_coords(self, image):
        """Patch centroid selection (reference net.py:119-136): RANDOM, or
        GRADIENT_BIAS — top-M of 3M candidates by pooled gradient magnitude
        (host numpy; mirrors HybridVO._select_coords without a device
        roundtrip)."""
        return select_coords(self.cfg, self.rng, image, self.M,
                             self.ht // RES, self.wd // RES)

    def _pack_buf(self, image, tstamp):
        """One flat uint8 row for vo_frame(s)_packed1:
        [image bytes (rgb or I420) | (M, 4) f32 aux bytes]."""
        aux = np.empty((self.M, 4), np.float32)
        aux[:, :2] = self._select_coords(image)
        aux[:, 2] = self.rng.rand(self.M)
        aux[:, 3] = tstamp
        if self._upload == 'yuv420':
            import cv2
            npix = self.ht * self.wd * 3 // 2
            pix = cv2.cvtColor(np.ascontiguousarray(image, np.uint8),
                               cv2.COLOR_RGB2YUV_I420).ravel()
        else:
            npix = self.ht * self.wd * 3
            pix = np.ascontiguousarray(image, np.uint8).ravel()
        buf = np.empty(npix + self.M * 16, np.uint8)
        buf[:npix] = pix
        buf[npix:] = aux.view(np.uint8).ravel()
        return buf

    def track_frames(self, tstamps, images, intrinsics):
        """Track a chunk of frames in ONE dispatch (device_vo.vo_frames).

        Throughput mode for offline evaluation / benchmarking: identical
        math to per-frame __call__, with the host/tunnel dispatch cost
        amortized over the chunk. images: (K, H, W, 3) uint8."""
        from .device_vo import CNT_CAP
        K = len(images)
        if self.st is None:
            self.st = init_state(self.cfg, self.ht, self.wd, intrinsics,
                                 self._static['corr_impl'])
        if len(self.tlist) + K >= CNT_CAP:
            raise Exception('input frame capacity exceeded; raise '
                            'device_vo.CNT_CAP')
        self._since_check += K
        if self._last_n + self._since_check + 2 >= self.cfg.BUFFER_SIZE:
            self._last_n = int(fetch(self.st.n))
            self._since_check = 0
            if self._last_n + K + 2 >= self.cfg.BUFFER_SIZE:
                raise Exception(
                    f'The buffer size is too small. You can increase it '
                    f'using "--opts BUFFER_SIZE={self.cfg.BUFFER_SIZE * 2}"')

        self.tlist.extend(tstamps)
        bufs = np.stack([self._pack_buf(images[k], tstamps[k])
                         for k in range(K)])
        from .device_vo import vo_frames_packed1
        self.st = vo_frames_packed1(
            self.params, self.st, jnp.asarray(bufs),
            ht=self.ht, wd=self.wd, upload=self._upload,
            oracle=self._oracle, **self._static)

    def _push_viewer_state(self):
        n = int(fetch(self.st.n))
        if n < 2:
            return
        poses_wfc = nse3.inv(fetch(self.st.poses[:n]))
        pts = self.point_cloud()
        clr = fetch(self.st.colors[:n]).reshape(-1, 3)
        self.viewer.update_state(poses_wfc, pts, clr)

    def terminate(self):
        from .device_vo import vo_refine
        for _ in range(12):
            self.st = vo_refine(self.params, self.st,
                                ht4=self.ht // 4, wd4=self.wd // 4,
                                oracle=self._oracle, **{
                k: v for k, v in self._static.items()
                if k in ('M', 'pmem', 'mem', 'W', 'PCF', 'opt_window',
                         'mixed_precision', 'corr_impl')})

        # the one big readback of the run (poll first: a blocking
        # fetch on a pending array stalls the tunnel, utils/fetch.py)
        fetch(self.st.n)
        st = jax.device_get((self.st.poses, self.st.tstamps,
                             self.st.delta_src, self.st.delta_pose,
                             self.st.n, self.st.counter))
        poses_np, tstamps, delta_src, delta_pose, n, counter = st
        n, counter = int(n), int(counter)

        traj = {}
        for i in range(n):
            traj[int(tstamps[i])] = poses_np[i]

        def get_pose(t):
            chain = []
            while t not in traj:
                chain.append(t)
                t = int(delta_src[t])
            pose = traj[t]
            for t1 in reversed(chain):
                pose = nse3.mul(delta_pose[t1], pose)
            return pose

        poses = np.stack([get_pose(t) for t in range(counter)])
        poses = nse3.inv(poses)
        tstamps_out = np.array(self.tlist, dtype=np.float64)
        if self.viewer is not None:
            self._push_viewer_state()
            self.viewer.join()
        return poses, tstamps_out

    # convenience accessors (post-hoc; each is one readback)
    @property
    def n(self):
        return int(fetch(self.st.n)) if self.st is not None else 0

    def point_cloud(self):
        from .. import projective as pops
        st = self.st
        n = int(fetch(st.n))
        m = n * self.M
        centers = fetch(st.centers[:n]).reshape(-1, 2)
        depth = fetch(st.depth[:m])
        poses = fetch(st.poses)
        intr = fetch(st.intr)
        xn = (centers[:, 0] - intr[2]) / intr[0]
        yn = (centers[:, 1] - intr[3]) / intr[1]
        pts_c = np.stack([xn, yn, np.ones(m)], -1) / np.maximum(
            depth[:, None], 1e-6)
        ix = np.arange(m) // self.M
        c2w = nse3.inv(poses[ix])
        return nse3.quat_rotate(c2w[:, 3:7], pts_c) + c2w[:, :3]

    def colors(self):
        n = int(fetch(self.st.n))
        clr = fetch(self.st.colors[:n])
        return np.clip(clr[..., [2, 1, 0]], 0, 255).astype(np.uint8)
