"""DPVO driver — host state machine around the jitted TPU step functions.

Same public API as the reference (dpvo/dpvo.py:20-473): construct with
(cfg, network, ht, wd), call per frame with (tstamp, image, intrinsics),
`terminate()` returns (poses, tstamps) with poses as inverted [x y z qx qy qz
qw] world-from-camera, exactly like dpvo.py:173-198.

Architecture (TPU-first, not a port):
  * device holds fixed-shape buffers (poses, patch grids, inverse depths,
    feature rings, per-edge recurrent state) — see runtime/state.py;
  * the host owns all integer bookkeeping: the active edge table, neighbor
    indices, group relabelings, keyframe decisions, motion model — NumPy
    mirrors of poses/depths are refreshed with one small D2H copy per frame,
    so no jitted code ever depends on data-driven Python control flow;
  * edge tables are padded to bucketed capacities so a handful of compiled
    shapes covers a whole run.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import lie
from ..models.checkpoint import load_network
from ..models.vonet import DIM, P, RES, VONetParams, init_vonet_params
from . import numpy_se3 as nse3
from ..utils.fetch import fetch, fetch_copy
from .state import (REMAP_CAP, edge_bucket, frame_step, gather_rows,
                    patchify_step, probe_median_delta, shift_frames,
                    store_frame, update_step)

from functools import partial


@partial(jax.jit, static_argnames=('M',), donate_argnums=(0, 1))
def _normalize_dev(poses, depth, n, *, M):
    """Device-side gauge normalization (reference patchgraph.py:84-95):
    s = mean inverse depth computed IN-GRAPH, depth[:n*M] /= s,
    translations[:n] *= s, rebase rows [:n] to pose 0 — one dispatch, no
    D2H. Returns the applied scale (1.0 when the guard trips) so the host
    can settle the removed-frame delta dict lazily (one packed fetch at
    terminate instead of a blocking scalar fetch per normalize)."""
    rowp = jnp.arange(poses.shape[0]) < n
    rowd = jnp.arange(depth.shape[0]) < n * M
    s = jnp.sum(jnp.where(rowd, depth, 0.0)) / jnp.maximum(n * M, 1)
    # defensive guard (ours, not the reference's): a non-finite or
    # non-positive mean means a diverged state — leave it untouched
    ok = jnp.isfinite(s) & (s > 0)
    s = jnp.where(ok, s, 1.0)
    depth = jnp.where(rowd, depth / s, depth)
    scaled = jnp.concatenate([poses[:, :3] * s, poses[:, 3:]], axis=1)
    base = lie.se3_inv(scaled[0])
    reb = lie.se3_mul(scaled, jnp.broadcast_to(base, scaled.shape))
    poses = jnp.where((rowp & ok)[:, None], reb, poses)
    return poses, depth, s


@partial(jax.jit, donate_argnames=('store',))
def _inac_append(store, target, weight, idx, ni):
    """Append retired edges' freshest target/weight rows to the ON-DEVICE
    inactive store (reference keeps them in CUDA memory, patchgraph.py:49-54)
    — a row gather + block write, zero D2H. idx: (Kb,) device rows to
    retire (valid-prefix compacted, -1 pads); ni: current store fill.
    Caller guarantees ni + Kb <= store rows."""
    rows = jnp.concatenate([gather_rows(target, jnp.maximum(idx, 0)),
                            gather_rows(weight, jnp.maximum(idx, 0))], -1)
    Kb = idx.shape[0]
    cur = jax.lax.dynamic_slice(store, (ni, 0), (Kb, 4))
    blk = jnp.where((idx >= 0)[:, None], rows, cur)
    return jax.lax.dynamic_update_slice(store, blk, (ni, 0))


@partial(jax.jit, static_argnames=('Eb',))
def _assemble_tw(inac, target, weight, mask, ni, *, Eb):
    """[inac[:ni] | active target/weight rows] padded to the global-BA
    bucket, assembled on device — global BA consumes the retired-edge store
    without any blocking target/weight fetch."""
    act = jnp.concatenate([target, weight], -1)
    big = jnp.zeros((max(Eb, inac.shape[0] + act.shape[0]), 4), jnp.float32)
    big = jax.lax.dynamic_update_slice(big, inac, (0, 0))
    big = jax.lax.dynamic_update_slice(big, act, (ni, 0))
    tw = jnp.where(mask[:, None], big[:Eb], 0.0)
    return tw[:, :2], tw[:, 2:]


class DPVO:

    def __init__(self, cfg, network, ht=480, wd=640, viz=False, seed=1234):
        self.cfg = cfg
        self.ht = ht
        self.wd = wd
        self.P = P
        self.RES = RES
        self.DIM = DIM
        self.is_initialized = False
        self.enable_timing = False

        self.M = cfg.PATCHES_PER_FRAME
        self.N = cfg.BUFFER_SIZE
        self.rng = np.random.RandomState(seed)

        # camera-native I420 ingest (1.5 B/px over the link, device-side
        # BT.601 — same helper as the device runtime, state.py frame_step)
        self._upload = str(getattr(cfg, 'UPLOAD_FORMAT', 'rgb')).lower()
        if self._upload == 'yuv420' and (ht % 2 or wd % 2):
            print(f'WARNING: UPLOAD_FORMAT=yuv420 needs even dims, got '
                  f'{ht}x{wd}; falling back to rgb ingest')
            self._upload = 'rgb'

        self.load_weights(network)

        # windows (static capacities for the BA jit)
        self.W_CAP = max(cfg.OPTIMIZATION_WINDOW, 8)
        self.PC_CAP = (cfg.REMOVAL_WINDOW + 4) * self.M

        ### frame memory (reference dpvo.py:57-76) ###
        from .device_vo import ring_capacity
        self.pmem = self.mem = ring_capacity(cfg)
        if cfg.LOOP_CLOSURE:
            self.last_global_ba = -1000
            self.pmem = cfg.MAX_EDGE_AGE

        M, N = self.M, self.N
        ht4, wd4 = ht // RES, wd // RES
        fdtype = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32

        # device buffers
        self.poses_dev = jnp.tile(
            jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32), (N, 1))
        self.patch_xy = jnp.zeros((N * M, 2, P, P), jnp.float32)
        self.depth_dev = jnp.ones((N * M,), jnp.float32)
        self.intr_dev = jnp.zeros((N, 4), jnp.float32)
        self.imap_dev = jnp.zeros((self.pmem * M, DIM), fdtype)
        self.gmap_dev = jnp.zeros((self.pmem * M, P, P, 128), fdtype)
        self.fmap1_dev = jnp.zeros((self.mem, ht4, wd4, 128), fdtype)
        self.fmap2_dev = jnp.zeros((self.mem, ht4 // 4, wd4 // 4, 128), fdtype)

        # per-edge device state (bucketed capacity)
        self._ecap = 128
        self.net_dev = jnp.zeros((self._ecap, DIM), fdtype)
        self.target_dev = jnp.zeros((self._ecap, 2), jnp.float32)
        self.weight_dev = jnp.zeros((self._ecap, 2), jnp.float32)

        # host mirrors + bookkeeping
        self.poses_np = np.tile(
            np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (N, 1))
        self.depth_np = np.ones(N * M, np.float32)
        self.centers_np = np.zeros((N * M, 2), np.float32)
        self.colors_np = np.zeros((N, M, 3), np.uint8)
        self.tstamps_ = np.zeros(N, np.int64)
        self.intr_np = np.zeros(4, np.float32)

        # active edges
        self.ii = np.zeros(0, np.int32)
        self.jj = np.zeros(0, np.int32)
        self.kk = np.zeros(0, np.int32)

        # inactive (retired) edges kept for global BA (reference
        # patchgraph.py:49-54). Indices are host bookkeeping; the retired
        # target/weight ROWS stay on device ([targ|wgt] packed (cap, 4)):
        # retiring edges is a device-side gather and global BA assembles
        # its full edge set on device, so the LC steady state never pays a
        # blocking target/weight D2H.
        self.ii_inac = np.zeros(0, np.int32)
        self.jj_inac = np.zeros(0, np.int32)
        self.kk_inac = np.zeros(0, np.int32)
        self._inac_cap = 2048
        self._inac_tw_dev = jnp.zeros((self._inac_cap, 4), jnp.float32)

        # deferred device operations (fused into the next frame_step).
        # MIRROR_PIPELINE=2 keeps up to two frames' packed mirrors in
        # flight: frame t's dispatch waits only on frame t-2's mirror —
        # which has had a full frame of wall time to cross the link — so
        # the per-frame dispatch->readback tunnel round-trip leaves the
        # critical path. Keyframe decisions consequently apply one frame
        # later than the reference's synchronous tail; pose/depth inits
        # stay exact because frame_step computes them on device
        # (state.py device_init). MIRROR_PIPELINE=1 (the config default)
        # is the reference-synchronous behavior; the bench opts into 2.
        self._deferred = []   # deque of (mirror, ns, t0, pb, aw, refresh)
        self._pipeline = max(1, int(getattr(cfg, 'MIRROR_PIPELINE', 1)))
        self._pending_kf_k = -1
        self._host_to_dev = np.zeros(0, np.int32)  # edge -> device net row
        # 'onepass' = single-kernel planes+select (ops/corr_onepass.py);
        # 'fused' = frame-resident Pallas corr kernel (ops/corr_fused.py);
        # 'xla' = pure-XLA fallback (ops/corr.py) for CPU/debug runs.
        # Decided OUTSIDE any jit trace (device_driver._pick_corr_impl).
        from .device_driver import _pick_corr_impl
        self._corr_mode = ('onepass' if _pick_corr_impl(ht, wd) == 'onepass'
                           else 'fused')
        # optional test seam: (poses, patch_xy, depth, intr, ii, jj, kk) ->
        # (target, weight), replacing the learned corr+update path
        self._oracle = None
        self._n_loop_edges = 0   # proximity edges proposed so far

        self.n = 0           # frame count
        self.m = 0           # patch count
        self.counter = 0     # input frame count
        self.tlist = []
        self.delta = {}      # removed-frame relative poses
        # deferred normalize scales: device scalar handles + per-delta
        # creation epochs, settled in ONE fetch at terminate
        self._scale_events = []
        self._delta_epoch = {}
        self.ran_global_ba = np.zeros(100000, dtype=bool)

        self.viewer = None
        if viz:
            self.start_viewer()

        self.points_np = np.zeros((N * M, 3), np.float32)

        if cfg.CLASSIC_LOOP_CLOSURE:
            self.load_long_term_loop_closure()
        else:
            self.long_term_lc = None

    # ------------------------------------------------------------------ #
    # setup
    # ------------------------------------------------------------------ #

    def load_weights(self, network):
        import os
        if network is None or (isinstance(network, str) and
                               (network in ('', 'none', 'random') or
                                not os.path.exists(network))):
            if network not in (None, '', 'none', 'random'):
                print(f'WARNING: network checkpoint {network!r} not found — '
                      f'using random weights')
            params = init_vonet_params(0)
        elif isinstance(network, str):
            params = load_network(network)
        elif isinstance(network, dict):
            params = network
        else:
            params = network  # already a VONetParams
        if not isinstance(params, VONetParams):
            params = VONetParams.from_f32(params)
        self.params = params

    def start_viewer(self):
        try:
            from ..viz.viewer import Viewer
            self.viewer = Viewer()
        except Exception as e:  # viewer is strictly optional
            print(f'WARNING: viewer unavailable: {e}')
            self.viewer = None

    def load_long_term_loop_closure(self):
        try:
            from ..loop_closure.long_term import LongTermLoopClosure
            self.long_term_lc = LongTermLoopClosure(self.cfg, self)
        except Exception as e:
            self.cfg.CLASSIC_LOOP_CLOSURE = False
            self.long_term_lc = None
            print(f'WARNING: {e}')

    # ------------------------------------------------------------------ #
    # small helpers
    # ------------------------------------------------------------------ #

    @property
    def ix(self):
        """frame index of every patch slot."""
        return self.kk // self.M  # patches live at frame*M + i

    def _select_coords(self, image):
        """Patch centroid selection (reference net.py:119-136): RANDOM, or
        GRADIENT_BIAS — top-M of 3M candidates by pooled gradient magnitude.
        Host numpy, candidate-windows-only scoring (runtime/centroid.py):
        the old device scoring cost a blocking per-frame dispatch->readback
        round-trip, and full-image scoring cost ~15 ms of host time."""
        from .centroid import select_coords
        return select_coords(self.cfg, self.rng, image, self.M,
                             self.ht // RES, self.wd // RES)

    def _edge_table(self, ii, jj, kk):
        """Pack the padded (12, E) int32 edge table + mask (host-side).

        Rows: ii, jj, kk, kk_slot, jj_slot, ix, jx, kk_ids, pair_ids,
        mask, device-row perm, used-frame slots (remap).
        Replaces the reference's device-side torch.unique / fastba.neighbors
        round trips (net.py:80-88) with host precomputation.
        """
        E = len(ii)
        M, pmem, mem = self.M, self.pmem, self.mem

        pad_pos = np.arange(E, dtype=np.int64)
        E_real_mask = np.ones(E, bool)

        cap = edge_bucket(max(E, 1))

        tab = np.zeros((12, cap), np.int32)
        tab[9, :E] = E_real_mask        # row 9: mask
        tab[10, :] = -1                 # row 10: device-row perm (caller fills)

        kk_frame = kk // M
        kk_slot = (kk_frame % pmem) * M + kk % M
        jj_slot = jj % mem

        # big feature rings (LOOP_CLOSURE: pmem = MAX_EDGE_AGE) defeat both
        # gather strategies on TPU — direct E-row gathers lower to a
        # sequential loop (~75 ms at E=49k) and a full one-hot would be
        # ~9 GB. Remap: gather the <=REMAP_CAP distinct source frames'
        # blocks first (tiny one-hot over pmem), then edge-gather from the
        # compacted table. Row 11 carries the used-frame slot list.
        remap = False
        if pmem * M > 8192 and E > 0:
            uf = np.unique(kk_frame[:E] % pmem)
            if len(uf) <= REMAP_CAP:
                remap = True
                lut = np.zeros(pmem, np.int64)
                lut[uf] = np.arange(len(uf))
                kk_slot = lut[kk_frame % pmem] * M + kk % M
                tab[11, :len(uf)] = uf

        # temporal neighbors: same patch, adjacent jj (stable by insertion
        # order of REAL edges; dummies excluded)
        ix = np.full(E, -1, np.int64)
        jx = np.full(E, -1, np.int64)
        real = np.nonzero(E_real_mask)[0]
        if len(real) > 0:
            kr, jr = kk[real], jj[real]
            order = real[np.lexsort((np.arange(len(real)), jr, kr))]
            sk = kk[order]
            same = sk[1:] == sk[:-1]
            ix[order[1:][same]] = order[:-1][same]
            jx[order[:-1][same]] = order[1:][same]

        # dense-enough group ids without np.unique: segment ids only need
        # to be unique per group and < cap (segment ops size num_segments=cap)
        if E > 0:
            rk = kk - kk.min()
            if rk.max() < cap:
                kk_ids = rk
            else:
                _, kk_ids = np.unique(kk, return_inverse=True)
            ri = ii - ii.min()
            rj = jj - jj.min()
            wj = int(rj.max()) + 1
            if (int(ri.max()) + 1) * wj <= cap:
                pair_ids = ri * wj + rj
            else:
                _, pair_ids = np.unique(ii.astype(np.int64) * 12345 + jj,
                                        return_inverse=True)
        else:
            kk_ids = np.zeros(0, np.int64)
            pair_ids = np.zeros(0, np.int64)

        tab[0, :E] = ii
        tab[1, :E] = jj
        tab[2, :E] = kk
        tab[3, :E] = kk_slot
        tab[4, :E] = jj_slot
        tab[5, :E] = ix
        tab[6, :E] = jx
        tab[5, E:] = -1
        tab[6, E:] = -1
        tab[7, :E] = kk_ids
        tab[8, :E] = pair_ids
        return tab, cap, pad_pos, remap

    # ------------------------------------------------------------------ #
    # edge lifecycle (reference dpvo.py:215-238, 362-375)
    # ------------------------------------------------------------------ #

    def append_factors(self, kk_new, jj_new):
        """Append edges host-side; device rows appear (zeroed) at the next
        fused gather — appended slots map to perm index -1."""
        kk_new = np.asarray(kk_new, np.int32)
        jj_new = np.asarray(jj_new, np.int32)
        self.kk = np.concatenate([self.kk, kk_new])
        self.jj = np.concatenate([self.jj, jj_new])
        self.ii = np.concatenate([self.ii, (kk_new // self.M)])
        self._host_to_dev = np.concatenate(
            [self._host_to_dev, np.full(len(kk_new), -1, np.int32)])

    def remove_factors(self, m, store):
        """m: bool mask over active edges to drop (True = remove).

        Device-buffer compaction is DEFERRED: the permutation accumulates in
        self._pending_perm and is applied inside the next frame_step (or by
        _flush_pending) — one fused gather instead of per-event dispatches.
        """
        if m.sum() == 0:
            return
        if store and self.cfg.LOOP_CLOSURE:
            # retire the freshest target/weight rows INTO the device store —
            # one small dispatch, no D2H (a blocking fetch here paid a full
            # tunnel roundtrip per frame, the LC modes' dominant cost)
            self._flush_pending()   # _host_to_dev becomes identity
            idx = np.where(m)[0].astype(np.int32)
            ni, K = len(self.ii_inac), len(idx)
            Kb = edge_bucket(K)
            while self._inac_cap < ni + Kb:      # pow-2 growth, rare
                self._inac_cap *= 2
                self._inac_tw_dev = jnp.pad(
                    self._inac_tw_dev,
                    ((0, self._inac_cap - self._inac_tw_dev.shape[0]),
                     (0, 0)))
            idx_p = np.full(Kb, -1, np.int32)
            idx_p[:K] = idx
            self._inac_tw_dev = _inac_append(
                self._inac_tw_dev, self.target_dev, self.weight_dev,
                jnp.asarray(idx_p), jnp.int32(ni))
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[m]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[m]])
            self.kk_inac = np.concatenate([self.kk_inac, self.kk[m]])
        self._host_to_dev = self._host_to_dev[~m]
        self.ii = self.ii[~m]
        self.jj = self.jj[~m]
        self.kk = self.kk[~m]

    def _sort_edges(self):
        """Canonical edge order: sorted by target ring slot (stable). The
        fused corr kernel streams one target-frame VMEM slab per run of
        equal target slot, so same-target edges must be contiguous."""
        order = np.argsort(self.jj % self.mem, kind='stable').astype(np.int32)
        if len(order) and not np.array_equal(order, np.arange(len(order))):
            self.ii = self.ii[order]
            self.jj = self.jj[order]
            self.kk = self.kk[order]
            self._host_to_dev = self._host_to_dev[order]

    def _flush_pending(self):
        """Apply deferred keyframe shift + edge compaction immediately."""
        if self._pending_kf_k >= 0:
            (self.poses_dev, self.patch_xy, self.depth_dev, self.intr_dev,
             self.imap_dev, self.gmap_dev, self.fmap1_dev, self.fmap2_dev) = \
                shift_frames(self.poses_dev, self.patch_xy, self.depth_dev,
                             self.intr_dev, self.imap_dev, self.gmap_dev,
                             self.fmap1_dev, self.fmap2_dev,
                             jnp.int32(self._pending_kf_k),
                             jnp.int32(self.n + 1),
                             M=self.M, pmem=self.pmem, mem=self.mem)
            self._pending_kf_k = -1
        E = len(self.ii)
        cap = edge_bucket(max(E, 1))
        ident = np.arange(E, dtype=np.int32)
        if cap != self._ecap or not np.array_equal(self._host_to_dev, ident):
            idx = np.full(cap, -1, np.int32)
            idx[:E] = self._host_to_dev
            idx_dev = jnp.asarray(idx)
            self.net_dev = gather_rows(self.net_dev, idx_dev)
            self.target_dev = gather_rows(self.target_dev, idx_dev)
            self.weight_dev = gather_rows(self.weight_dev, idx_dev)
            self._ecap = cap
            self._host_to_dev = ident

    def __edges_forw(self):
        r = self.cfg.PATCH_LIFETIME
        t0 = self.M * max(self.n - r, 0)
        t1 = self.M * max(self.n - 1, 0)
        kk, jj = np.meshgrid(np.arange(t0, t1),
                             np.arange(self.n - 1, self.n), indexing='ij')
        return kk.ravel(), jj.ravel()

    def __edges_back(self):
        r = self.cfg.PATCH_LIFETIME
        t0 = self.M * max(self.n - 1, 0)
        t1 = self.M * max(self.n - 0, 0)
        kk, jj = np.meshgrid(np.arange(t0, t1),
                             np.arange(max(self.n - r, 0), self.n),
                             indexing='ij')
        return kk.ravel(), jj.ravel()

    # ------------------------------------------------------------------ #
    # core update (reference dpvo.py:328-360)
    # ------------------------------------------------------------------ #

    def _run_update(self, run_ba=True):
        """Standalone update+BA dispatch (bootstrap / terminate path; the
        steady-state per-frame path runs fused inside frame_step)."""
        self._sort_edges()          # corr_fused groups edges by target slot
        self._flush_pending()
        tab_np, cap, _, remap = self._edge_table(self.ii, self.jj, self.kk)
        tab_full = jnp.asarray(tab_np)
        tab = tab_full
        mask = tab_full[9].astype(bool)

        # long-range edges trigger global BA (reference dpvo.py:345-354)
        use_global = (run_ba and
                      (self.ii < self.n - self.cfg.REMOVAL_WINDOW - 1).any()
                      and not self.ran_global_ba[self.n])

        if self.is_initialized:
            t0 = max(self.n - self.cfg.OPTIMIZATION_WINDOW, 1)
        else:
            t0 = 1
        patch_base = max(self.n - self.cfg.REMOVAL_WINDOW - 2, 0) * self.M

        (self.net_dev, self.poses_dev, self.depth_dev,
         self.target_dev, self.weight_dev, delta) = update_step(
            self.params, self.poses_dev, self.patch_xy, self.depth_dev,
            self.intr_dev, self.imap_dev, self.gmap_dev, self.fmap1_dev,
            self.fmap2_dev, self.net_dev, tab, mask,
            jnp.int32(t0), jnp.int32(self.n), jnp.int32(patch_base),
            W=self.W_CAP, PC=self.PC_CAP, iterations=2,
            run_ba=run_ba and not use_global,
            mixed_precision=self.cfg.MIXED_PRECISION,
            corr_mode=self._corr_mode, oracle=self._oracle,
            gmap_remap=remap, M=self.M)

        if use_global:
            self._run_global_ba()
            # global BA touches all patches; refresh the whole mirror
            # (ONE packed D2H)
            self._refresh_pose_depth_mirrors()
            return

        # refresh host mirrors (one small D2H per frame)
        self.poses_np = fetch_copy(self.poses_dev)
        dwin = fetch(jax.lax.dynamic_slice(
            self.depth_dev, (patch_base,), (self.PC_CAP,)))
        self.depth_np[patch_base:patch_base + self.PC_CAP] = dwin

    def _start_refresh(self):
        """Dispatch the packed depth+poses D2H; returns the device handle
        (fetchable later, overlapped with subsequent frames' wall time)."""
        pd = jnp.concatenate([self.depth_dev, self.poses_dev.ravel()])
        if hasattr(pd, 'copy_to_host_async'):
            pd.copy_to_host_async()
        return pd

    def _apply_refresh(self, pd_handle):
        nd = self.depth_dev.shape[0]
        pd = fetch(pd_handle)
        self.depth_np = pd[:nd].copy()
        self.poses_np = pd[nd:].reshape(-1, 7).copy()

    def _refresh_pose_depth_mirrors(self):
        """depth+poses mirrors from one packed D2H instead of two."""
        self._apply_refresh(self._start_refresh())

    def _run_global_ba(self):
        """Global bundle adjustment over active + inactive edges
        (reference dpvo.py:312-326)."""
        from ..ba_global import global_ba

        self.normalize()

        from ..ba_global import edge_cap
        E = len(self.ii)
        ni = len(self.ii_inac)
        self._flush_pending()    # active device rows must be host-ordered
        full_ii = np.concatenate([self.ii_inac, self.ii])
        full_jj = np.concatenate([self.jj_inac, self.jj])
        full_kk = np.concatenate([self.kk_inac, self.kk])
        # assemble the full target/weight set ON DEVICE from the retired-
        # edge store + the live rows: global BA dispatches with zero D2H
        Eb = edge_cap(ni + E)
        mask = np.zeros(Eb, bool)
        mask[:ni + E] = True
        full_t, full_w = _assemble_tw(
            self._inac_tw_dev, self.target_dev, self.weight_dev,
            jnp.asarray(mask), jnp.int32(ni), Eb=Eb)

        t0 = int(self.ii.min())
        self.poses_dev, self.depth_dev = global_ba(
            self.poses_dev, jnp.asarray(self.centers_np), self.depth_dev,
            self.intr_dev[0], full_t, full_w, full_ii, full_jj, full_kk,
            t0, self.n, self.M, iterations=2)
        self.ran_global_ba[self.n] = True

    def normalize(self):
        """Scale/gauge normalization before global BA
        (reference patchgraph.py:84-95): mean inverse depth -> 1, rebase to
        pose 0.

        Everything runs ON DEVICE — including the mean-depth scale — so
        this is dispatch-only. The removed-frame delta dict needs each
        applied scale on the host, but not until terminate(): the scalar
        handles accumulate in _scale_events and _settle_deltas() fetches
        them in ONE packed D2H (the per-normalize blocking scalar fetch
        was a full tunnel roundtrip in the LC steady state). The stale
        host mirrors are refreshed by the packed post-global-BA fetch that
        always follows (_refresh_pose_depth_mirrors)."""
        self.poses_dev, self.depth_dev, s_dev = _normalize_dev(
            self.poses_dev, self.depth_dev, jnp.int32(self.n), M=self.M)
        self._scale_events.append(s_dev)

    def _settle_deltas(self):
        """Apply deferred normalize scales to the delta dict: an entry
        created at epoch e (== len(_scale_events) then) is scaled by every
        normalize that happened after it, i.e. prod(scales[e:])."""
        if not self._scale_events:
            return
        scales = np.asarray(fetch(jnp.stack(self._scale_events)), np.float64)
        # suffix products: suffix[e] = prod(scales[e:]); suffix[n_events]=1
        suffix = np.concatenate([np.cumprod(scales[::-1])[::-1], [1.0]])
        for t, (t0, dP) in self.delta.items():
            e = self._delta_epoch.get(t, len(scales))
            if suffix[e] != 1.0:
                dPs = dP.copy()
                dPs[:3] *= np.float32(suffix[e])
                self.delta[t] = (t0, dPs)
            self._delta_epoch[t] = 0
        self._scale_events = []

    def update(self):
        self._drain()
        self._run_update(run_ba=True)

    def motion_probe(self):
        """Median update-magnitude on probe edges (reference dpvo.py:240-255)."""
        kk = np.arange(self.m - self.M, self.m, dtype=np.int32)
        jj = np.full_like(kk, self.n)
        tab_np, cap, _, remap = self._edge_table(kk // self.M, jj, kk)
        tab_full = jnp.asarray(tab_np)
        tab = tab_full
        mask = tab_full[9].astype(bool)
        net = jnp.zeros((cap, DIM), self.net_dev.dtype)
        out = update_step(
            self.params, self.poses_dev, self.patch_xy, self.depth_dev,
            self.intr_dev, self.imap_dev, self.gmap_dev, self.fmap1_dev,
            self.fmap2_dev, net, tab, mask,
            jnp.int32(1), jnp.int32(self.n), jnp.int32(0),
            W=self.W_CAP, PC=self.PC_CAP, iterations=2, run_ba=False,
            mixed_precision=self.cfg.MIXED_PRECISION,
            corr_mode=self._corr_mode, oracle=self._oracle,
            gmap_remap=remap, M=self.M)
        _, self.poses_dev, self.depth_dev, _, _, delta = out
        return float(fetch(probe_median_delta(delta, mask)))

    # ------------------------------------------------------------------ #
    # keyframing (reference dpvo.py:266-310)
    # ------------------------------------------------------------------ #

    def motionmag(self, i, j):
        k = (self.ii == i) & (self.jj == j)
        if k.sum() == 0:
            return 0.0
        flow, val = nse3.flow_mag(
            self.poses_np, self.centers_np, self.depth_np, self.intr_np,
            self.ii[k], self.jj[k], self.kk[k], beta=0.5)
        return float(flow.mean())

    def keyframe(self):
        i = self.n - self.cfg.KEYFRAME_INDEX - 1
        j = self.n - self.cfg.KEYFRAME_INDEX + 1
        m_flow = (self.motionmag(i, j) + self.motionmag(j, i)) / 2

        if m_flow < self.cfg.KEYFRAME_THRESH:
            # a removal renumbers host rows, so (a) any PREVIOUS removal
            # still deferred must reach the device first (full-sync drains
            # can decide twice between dispatches), and (b) any in-flight
            # mirrors — computed against the pre-removal numbering — must
            # land before the host arrays shift under them. NOTE: the
            # keyframe checks those mirrors would have triggered through
            # _drain_one are DROPPED, not re-run — the check window is a
            # fixed lag off self.n, so a skipped frame is never
            # re-examined and an occasional redundant keyframe can
            # survive vs the reference's per-frame tail. Only reachable
            # with MIRROR_PIPELINE>1 (at the default of 1, drains happen
            # every frame and nothing is ever deferred).
            if self._pending_kf_k >= 0:
                self._flush_pending()
            while self._deferred:
                self._apply_deferred(self._deferred.pop(0))

            k = self.n - self.cfg.KEYFRAME_INDEX
            t0 = self.tstamps_[k - 1]
            t1 = self.tstamps_[k]

            dP = nse3.mul(self.poses_np[k], nse3.inv(self.poses_np[k - 1]))
            self.delta[t1] = (t0, dP)
            self._delta_epoch[t1] = len(self._scale_events)

            to_remove = (self.ii == k) | (self.jj == k)
            self.remove_factors(to_remove, store=False)

            self.kk[self.ii > k] -= self.M
            self.ii[self.ii > k] -= 1
            self.jj[self.jj > k] -= 1

            # device-side frame compaction is DEFERRED into the next
            # frame_step (kf_k); host mirrors shift immediately
            self._pending_kf_k = k

            # host mirrors
            sl = slice(k, self.n - 1)
            self.tstamps_[sl] = self.tstamps_[k + 1:self.n]
            self.colors_np[sl] = self.colors_np[k + 1:self.n]
            self.poses_np[sl] = self.poses_np[k + 1:self.n]
            self.centers_np[k * self.M:(self.n - 1) * self.M] = \
                self.centers_np[(k + 1) * self.M:self.n * self.M]
            self.depth_np[k * self.M:(self.n - 1) * self.M] = \
                self.depth_np[(k + 1) * self.M:self.n * self.M]

            self.n -= 1
            self.m -= self.M

            if self.cfg.CLASSIC_LOOP_CLOSURE and self.long_term_lc:
                self.long_term_lc.keyframe(k)

        # retire edges that left the optimization window
        to_remove = (self.kk // self.M) < (self.n - self.cfg.REMOVAL_WINDOW)
        if self.cfg.LOOP_CLOSURE:
            lc_edges = ((self.jj - self.ii) > 30) & \
                (self.jj > (self.n - self.cfg.OPTIMIZATION_WINDOW))
            to_remove = to_remove & ~lc_edges
        self.remove_factors(to_remove, store=True)

    # ------------------------------------------------------------------ #
    # per-frame entry (reference dpvo.py:377-473)
    # ------------------------------------------------------------------ #

    def __call__(self, tstamp, image, intrinsics):
        """Track one frame. image: (H, W, 3) uint8 (BGR, like cv2)."""
        # steady state drains one mirror per frame once the pipeline is
        # full; with MIRROR_PIPELINE=1 this is the reference-synchronous
        # drain of the immediately preceding frame
        while len(self._deferred) >= self._pipeline:
            self._drain_one()
        if self.cfg.CLASSIC_LOOP_CLOSURE and self.long_term_lc:
            self.long_term_lc(image, self.n)

        if (self.n + 1) >= self.N:
            raise Exception(
                f'The buffer size is too small. You can increase it using '
                f'"--opts BUFFER_SIZE={self.N * 2}"')

        if self.viewer is not None:
            self.viewer.update_image(image)

        intrinsics = np.asarray(intrinsics, np.float32)
        self.intr_np = intrinsics / self.RES

        if self._upload == 'yuv420':
            import cv2
            image_dev = jnp.asarray(cv2.cvtColor(
                np.ascontiguousarray(image, np.uint8),
                cv2.COLOR_RGB2YUV_I420))        # (3h/2, w) plane stack
        else:
            image_dev = jnp.asarray(np.ascontiguousarray(image), jnp.uint8)
        coords = self._select_coords(image)

        ns, M = self.n, self.M
        self.tlist.append(tstamp)
        self.tstamps_[ns] = self.counter

        # motion model (reference dpvo.py:410-424). The host computes a
        # PROVISIONAL init for its own mirror row; once initialized the
        # device recomputes the same model in-graph from its (fresher)
        # poses (state.py device_init), so pipelined mirrors never feed a
        # stale init into BA.
        self._motion_fac = 1.0
        if ns > 1 and self.cfg.MOTION_MODEL == 'DAMPED_LINEAR':
            P1 = self.poses_np[ns - 1]
            P2 = self.poses_np[ns - 2]
            *_, a, b, c = [1] * 3 + self.tlist
            fac = (c - b) / (b - a) if b != a else 1.0
            self._motion_fac = self.cfg.MOTION_DAMPING * fac
            xi = self._motion_fac * nse3.log(nse3.mul(P1, nse3.inv(P2)))
            pose_init = nse3.mul(nse3.exp(xi), P1)
        else:
            pose_init = self.poses_np[max(ns - 1, 0)].copy()

        # patch depth init (reference dpvo.py:426-431)
        if self.is_initialized:
            s = np.median(self.depth_np[(ns - 3) * M:ns * M])
            depth_init = np.full(M, s, np.float32)
        else:
            depth_init = self.rng.rand(M).astype(np.float32)

        # host mirrors for the new frame
        self.poses_np[ns] = pose_init
        self.centers_np[ns * M:(ns + 1) * M] = coords
        self.depth_np[ns * M:(ns + 1) * M] = depth_init
        self.counter += 1

        if not self.is_initialized:
            # store-only step, then the learned motion probe
            mirror, t0, pb, aw = self._fused_step(
                image_dev, coords, pose_init, depth_init,
                ns, do_update=False, run_ba=False)
            self._apply_mirror(mirror, ns, t0, pb, aw)
            if ns > 0 and self.motion_probe() < 2.0:
                self.delta[self.counter - 1] = (self.counter - 2,
                                                nse3.identity())
                self._delta_epoch[self.counter - 1] = \
                    len(self._scale_events)
                return
            self.n += 1
            self.m += M
            self.append_factors(*self.__edges_forw())
            self.append_factors(*self.__edges_back())
            if self.n == 8:
                self.is_initialized = True
                for _ in range(12):
                    self.update()
            return

        # ---------------- initialized: one fused dispatch ---------------- #
        self.n += 1
        self.m += M

        if self.cfg.LOOP_CLOSURE:
            if self.n - self.last_global_ba >= self.cfg.GLOBAL_OPT_FREQ:
                self._drain()        # proximity reads the pose mirrors
                lii, ljj = self.edges_loop()
                if len(lii) > 0:
                    self.last_global_ba = self.n
                    self.append_factors(lii, ljj)

        self.append_factors(*self.__edges_forw())
        self.append_factors(*self.__edges_back())

        use_global = (self.cfg.LOOP_CLOSURE and
                      (self.ii < self.n - self.cfg.REMOVAL_WINDOW - 1).any()
                      and not self.ran_global_ba[self.n])
        if use_global and self._pipeline == 1:
            self._drain()            # mirrors must apply in dispatch order

        dev_init = ('damped' if (ns > 1 and
                                 self.cfg.MOTION_MODEL == 'DAMPED_LINEAR')
                    else 'last')
        mirror, t0, pb, aw = self._fused_step(
            image_dev, coords, pose_init, depth_init,
            ns, do_update=True, run_ba=not use_global,
            device_init=dev_init, motion_fac=self._motion_fac)

        if use_global and self._pipeline == 1:
            # reference-synchronous: finish this frame's post-step inline
            self._apply_mirror(mirror, ns, t0, pb, aw)
            self._run_global_ba()
            self._refresh_pose_depth_mirrors()
            self.keyframe()
            if self.viewer is not None and self.n % 3 == 0:
                self._push_viewer_state()
            if self.cfg.CLASSIC_LOOP_CLOSURE and self.long_term_lc:
                self.long_term_lc.attempt_loop_closure(self.n)
                self.long_term_lc.lc_callback()
            return

        refresh = None
        if use_global:
            # pipelined: global BA is dispatch-only (device-resident
            # inactive store, in-graph normalize), and its pose/depth
            # mirror refresh rides the deferred queue — the LC steady
            # state has NO blocking fetch on the frame's critical path
            self._run_global_ba()
            refresh = self._start_refresh()
        # steady state: defer the mirror sync MIRROR_PIPELINE frames;
        # start the D2H now so it crosses the link during later frames
        if hasattr(mirror, 'copy_to_host_async'):
            mirror.copy_to_host_async()
        self._deferred.append((mirror, ns, t0, pb, aw, refresh))

    def _push_viewer_state(self):
        """3D snapshot from the host mirrors — no extra device traffic
        (reference pushes points every update, dpvo.py:358-360)."""
        n, M = self.n, self.M
        if n < 2:
            return
        centers = self.centers_np[:n * M]
        depth = np.maximum(self.depth_np[:n * M], 1e-6)
        fx, fy, cx, cy = self.intr_np
        xn = (centers[:, 0] - cx) / fx
        yn = (centers[:, 1] - cy) / fy
        pts_c = np.stack([xn, yn, np.ones(n * M)], -1) / depth[:, None]
        c2w = nse3.inv(self.poses_np[np.arange(n * M) // M])
        pts = nse3.act(c2w, pts_c)
        poses_wfc = nse3.inv(self.poses_np[:n])
        clr = self.colors_np[:n].reshape(-1, 3)[:, ::-1]
        self.viewer.update_state(poses_wfc, pts, clr)

    def _set_colors(self, ns, clr):
        self.colors_np[ns] = np.clip(
            np.asarray(clr)[:, [2, 1, 0]], 0, 255).astype(np.uint8)

    def _fused_step(self, image_dev, coords, pose_init, depth_init, ns,
                    do_update, run_ba, device_init=None, motion_fac=1.0):
        """One frame_step dispatch; updates device buffers + host mirrors."""
        if do_update:
            self._sort_edges()
            tab, cap, pad_pos, remap = self._edge_table(
                self.ii, self.jj, self.kk)
        else:
            cap = edge_bucket(max(len(self.ii), 1))
            tab = np.zeros((12, cap), np.int32)
            tab[10, :] = -1
            pad_pos = np.arange(len(self.ii))
            remap = False

        tab[10, pad_pos] = self._host_to_dev    # row 10: device-row perm
        tab_dev = jnp.asarray(tab)               # ONE H2D for all edge data

        if self.is_initialized:
            t0 = max(self.n - self.cfg.OPTIMIZATION_WINDOW, 1)
        else:
            t0 = 1
        patch_base = max(self.n - self.cfg.REMOVAL_WINDOW - 2, 0) * self.M

        (self.poses_dev, self.patch_xy, self.depth_dev, self.intr_dev,
         self.imap_dev, self.gmap_dev, self.fmap1_dev, self.fmap2_dev,
         self.net_dev, self.target_dev, self.weight_dev,
         mirror, delta) = frame_step(
            self.params, self.poses_dev, self.patch_xy, self.depth_dev,
            self.intr_dev, self.imap_dev, self.gmap_dev, self.fmap1_dev,
            self.fmap2_dev, self.net_dev, self.target_dev, self.weight_dev,
            image_dev, jnp.asarray(coords), tab_dev,
            jnp.asarray(pose_init), jnp.asarray(self.intr_np),
            jnp.asarray(depth_init),
            jnp.int32(ns), jnp.int32(ns % self.pmem), jnp.int32(ns % self.mem),
            jnp.int32(t0), jnp.int32(patch_base),
            jnp.int32(self._pending_kf_k), jnp.float32(motion_fac),
            W=self.W_CAP, PC=self.PC_CAP, iterations=2, run_ba=run_ba,
            do_update=do_update, mixed_precision=self.cfg.MIXED_PRECISION,
            M=self.M, pmem=self.pmem, mem=self.mem,
            corr_mode=self._corr_mode, oracle=self._oracle,
            gmap_remap=remap, device_init=device_init)

        self._pending_kf_k = -1
        self._host_to_dev = pad_pos.astype(np.int32)
        self._ecap = cap

        return mirror, t0, patch_base, (do_update and run_ba)

    def _apply_deferred(self, entry):
        """Apply one deferred post-step: the packed mirror, then (for a
        pipelined global-BA frame) the full pose/depth refresh that
        supersedes it."""
        mirror, ns, t0, patch_base, apply_windows, refresh = entry
        self._apply_mirror(mirror, ns, t0, patch_base, apply_windows)
        if refresh is not None:
            self._apply_refresh(refresh)

    def _apply_mirror(self, mirror, ns, t0, patch_base, apply_windows):
        """Unpack the packed mirror vector (ONE D2H) into the host mirrors.

        Slice starts are clamped identically on device (state.py frame_step),
        so row 0 of each window corresponds to the host-computed start.
        Rows are additionally capped at the DISPATCH-time frame count
        (ns + 1): under mirror pipelining the host may have appended newer
        frames whose device rows were still unwritten when this mirror was
        computed — those lanes hold stale data, not fresher poses."""
        m = fetch(mirror)
        W2 = self.W_CAP + 2
        if apply_windows:
            ps = min(t0, self.N - W2)
            hi = min(ps + W2, self.n, ns + 1)
            self.poses_np[ps:hi] = m[:W2 * 7].reshape(W2, 7)[:hi - ps]
            ds = min(patch_base, self.N * self.M - self.PC_CAP)
            de = min(ds + self.PC_CAP, (ns + 1) * self.M)
            self.depth_np[ds:de] = m[W2 * 7:W2 * 7 + (de - ds)]
        self._set_colors(ns, m[W2 * 7 + self.PC_CAP:].reshape(self.M, 3))

    def _drain_one(self):
        """Finish the OLDEST deferred post-step: materialize its mirror
        fetch (overlapped with host work since dispatch via
        copy_to_host_async) and run keyframing / viewer / classic-LC hooks.

        Order-preserving: mirrors apply in dispatch order, and every hook
        still runs before the frame whose dispatch depends on it — only
        the host/device sync point moves later, hiding the tunnel's
        per-sync latency behind subsequent frames' wall time."""
        if not self._deferred:
            return
        self._apply_deferred(self._deferred.pop(0))
        self.keyframe()
        if self.viewer is not None and self.n % 3 == 0:
            self._push_viewer_state()
        if self.cfg.CLASSIC_LOOP_CLOSURE and self.long_term_lc:
            self.long_term_lc.attempt_loop_closure(self.n)
            self.long_term_lc.lc_callback()

    def _drain(self):
        """Full sync: apply every in-flight mirror (global BA, proximity
        scheduling, update(), terminate() need fresh host mirrors)."""
        while self._deferred:
            self._drain_one()

    # ------------------------------------------------------------------ #
    # loop-closure proximity edges (reference patchgraph.py:56-82)
    # ------------------------------------------------------------------ #

    def edges_loop(self):
        from ..loop_closure.proximity import proximity_edges
        kk, jj = proximity_edges(self)
        self._n_loop_edges += len(kk)      # diagnostics / tests
        return kk, jj

    # ------------------------------------------------------------------ #
    # termination (reference dpvo.py:173-198)
    # ------------------------------------------------------------------ #

    def get_pose(self, t):
        if t in self.traj:
            return self.traj[t]
        t0, dP = self.delta[t]
        return nse3.mul(dP, self.get_pose(t0))

    def terminate(self):
        self._drain()
        if self.cfg.CLASSIC_LOOP_CLOSURE and self.long_term_lc:
            self.long_term_lc.terminate(self.n)

        if self.cfg.LOOP_CLOSURE:
            lii, ljj = self.edges_loop()
            if len(lii) > 0:
                self.append_factors(lii, ljj)

        for _ in range(12):
            self.ran_global_ba[self.n] = False
            self.update()

        self._settle_deltas()
        self.traj = {}
        for i in range(self.n):
            self.traj[self.tstamps_[i]] = self.poses_np[i]

        poses = [self.get_pose(t) for t in range(self.counter)]
        poses = np.stack(poses, axis=0)
        poses = nse3.inv(poses)
        tstamps = np.array(self.tlist, dtype=np.float64)

        if self.viewer is not None:
            self.viewer.join()

        return poses, tstamps

    # convenience: point cloud for export/viz
    def point_cloud(self):
        from .. import projective as pops
        m = self.m
        xy = self.patch_xy[:m, :, 1, 1]
        patches = jnp.concatenate(
            [self.patch_xy[:m], jnp.broadcast_to(
                self.depth_dev[:m, None, None, None], (m, 1, P, P))], axis=1)
        ix = jnp.asarray(np.arange(m) // self.M)
        pts = pops.point_cloud(self.poses_dev, patches, self.intr_dev, ix)
        pts = np.asarray(pts[..., 1, 1, :])
        return pts[..., :3] / np.maximum(pts[..., 3:], 1e-8)
