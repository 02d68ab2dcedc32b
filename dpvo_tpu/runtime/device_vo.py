"""Fully device-resident VO state machine — zero per-frame readback.

Motivation: device->host transfers through the TPU attach path cost ~100 ms
EACH regardless of size; any per-frame mirror fetch caps the system below
10 FPS. This runtime keeps the ENTIRE SLAM state machine of the reference
(dpvo/dpvo.py:377-473) on device:

  * the edge table is PAIR-BLOCKED: edges always come as (source frame i,
    target frame j) x all M patches (that is how the reference creates them,
    dpvo.py:362-375), so the table is (GP_CAP,) pairs with validity masks —
    fixed shapes, one compiled step for the whole run;
  * motion model, probe accept/reject, bootstrap, keyframe decision + buffer
    shift, edge append/retire/compaction, trajectory deltas: all in-graph
    (lax.cond / masked writes);
  * the host only feeds frames (H2D is fast) and reads NOTHING until
    terminate().

Loop-closure configs (LOOP_CLOSURE / CLASSIC_LOOP_CLOSURE) use the hybrid
host-driven runtime in runtime/dpvo.py instead (global BA and retrieval are
host-orchestrated and rare).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import lie
from ..ba_pairs import bundle_adjust_pairs, pair_centers, pair_depth
from ..models.vonet import DIM, P, patchify_frame, update_op
from ..ops.corr_fused import (corr_fused, pad_hw, pad_hw2,
                              pad_slab, pad_slab2)
from ..ops.corr_onepass import corr_onepass, pad_slab1pair

CNT_CAP = 16384     # max input frames per sequence


@jax.tree_util.register_pytree_node_class
@dataclass
class VOState:
    poses: jnp.ndarray        # (N, 7)
    centers: jnp.ndarray      # (N, 2*M) frame-major, (M,2) blocks flattened
    depth: jnp.ndarray        # (N*M,)
    colors: jnp.ndarray       # (N, M, 3) f32
    imap: jnp.ndarray         # (pmem*M, DIM) bf16
    gmap: jnp.ndarray         # (pmem*M, P, P, 128) bf16
    fmap1: jnp.ndarray        # (mem, Hp4, Wp4, 128) bf16, padded (pad_hw)
    fmap2: jnp.ndarray        # (mem, 2, Hp16, Wp16, 128) phase pair
    pi: jnp.ndarray           # (GP,) int32 source frame per pair
    pj: jnp.ndarray           # (GP,) int32 target frame per pair
    pvalid: jnp.ndarray       # (GP,) bool
    net: jnp.ndarray          # (GP, M, DIM) bf16
    target: jnp.ndarray       # (GP, M, 2)
    weight: jnp.ndarray       # (GP, M, 2)
    tstamps: jnp.ndarray      # (N,) int32: keyframe -> input counter
    in_times: jnp.ndarray     # (CNT_CAP,) f32 raw input timestamps
    delta_src: jnp.ndarray    # (CNT_CAP,) int32 (-1 = live keyframe)
    delta_pose: jnp.ndarray   # (CNT_CAP, 7)
    n: jnp.ndarray            # scalar int32: keyframe count
    counter: jnp.ndarray      # scalar int32: input frame count
    is_init: jnp.ndarray      # scalar bool
    intr: jnp.ndarray         # (4,) shared intrinsics / RES
    fslot: jnp.ndarray        # (N,) int32 frame index -> feature ring slot

    def tree_flatten(self):
        fields = (self.poses, self.centers, self.depth, self.colors,
                  self.imap, self.gmap, self.fmap1, self.fmap2,
                  self.pi, self.pj, self.pvalid, self.net, self.target,
                  self.weight, self.tstamps, self.in_times, self.delta_src,
                  self.delta_pose, self.n, self.counter, self.is_init,
                  self.intr, self.fslot)
        return fields, None

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields)


def ring_capacity(cfg):
    """Feature-ring slots. The fslot allocator scans a live window of
    PCF + 2 = REMOVAL_WINDOW + 6 frames, so the ring must strictly exceed
    it or argmin(used) would hand out a still-referenced slot and silently
    overwrite a live frame's features (ADVICE r1 #2)."""
    return max(36, int(cfg.REMOVAL_WINDOW) + 7)


def init_state(cfg, ht, wd, intrinsics, corr_impl='fused'):
    M = cfg.PATCHES_PER_FRAME
    N = cfg.BUFFER_SIZE
    pmem = mem = ring_capacity(cfg)
    r = cfg.PATCH_LIFETIME
    GP = _gp_cap(cfg)
    ht4, wd4 = ht // 4, wd // 4
    f16 = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    # the one-pass kernel wants the L1 slab as a 4px-shifted PHASE PAIR
    # (ops/corr_onepass.py:pad_slab1pair); corr_fused wants single-phase
    f1_shape = (((mem, 2) if corr_impl == 'onepass' else (mem,))
                + pad_hw(ht4, wd4) + (128,))

    return VOState(
        poses=jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                       (N, 1)),
        # frame-major rows: the old (N*M, 2) storage cost ~1.1 ms/frame of
        # XLA relayout copies around the pair gathers / state updates
        centers=jnp.zeros((N, 2 * M), jnp.float32),
        depth=jnp.ones((N * M,), jnp.float32),
        colors=jnp.zeros((N, M, 3), jnp.float32),
        imap=jnp.zeros((pmem * M, DIM), f16),
        gmap=jnp.zeros((pmem * M, P, P, 128), f16),
        # feature slabs live PRE-PADDED (corr_fused pad_slab /
        # corr_onepass pad_slab1pair): the border padding happens once per
        # stored frame, not per corr call
        fmap1=jnp.zeros(f1_shape, f16),
        fmap2=jnp.zeros((mem, 2) + pad_hw2(ht4 // 4, wd4 // 4) + (128,), f16),
        pi=jnp.zeros((GP,), jnp.int32),
        pj=jnp.zeros((GP,), jnp.int32),
        pvalid=jnp.zeros((GP,), bool),
        net=jnp.zeros((GP, M, DIM), f16),
        target=jnp.zeros((GP, M, 2), jnp.float32),
        weight=jnp.zeros((GP, M, 2), jnp.float32),
        tstamps=jnp.zeros((N,), jnp.int32),
        in_times=jnp.zeros((CNT_CAP,), jnp.float32),
        delta_src=jnp.full((CNT_CAP,), -1, jnp.int32),
        delta_pose=jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                            (CNT_CAP, 1)),
        n=jnp.int32(0),
        counter=jnp.int32(0),
        is_init=jnp.asarray(False),
        intr=jnp.asarray(np.asarray(intrinsics, np.float32) / 4.0),
        fslot=jnp.zeros((N,), jnp.int32),
    )


def _gp_cap(cfg):
    """Static pair capacity = exact steady-state maximum of live pairs.

    A source frame i = n-k contributes at most r backward pairs (created at
    step i+1) plus min(r-1, k-1) forward pairs (created at steps i+2..i+r);
    sources are retired when k > REMOVAL_WINDOW. Summing over k=1..Rw and
    adding one frame's fresh appends (2r-1) as margin gives the bound.
    """
    r = cfg.PATCH_LIFETIME
    rw = cfg.REMOVAL_WINDOW
    total = sum(min(r - 1, k - 1) + r for k in range(1, rw + 1))
    total += 2 * r - 1
    return int(-(-total // 64) * 64)


# ---------------------------------------------------------------------------
# in-graph helpers
# ---------------------------------------------------------------------------

def _center_flow(poses, centers, depth, intr, i, j, M, beta=0.5):
    """Mean blended flow magnitude of frame i's patch centers into frame j
    (reference pops.flow_mag at the keyframe test, dpvo.py:257-264)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    c = jax.lax.dynamic_slice(centers, (i, 0), (1, 2 * M)).reshape(M, 2)
    d = jax.lax.dynamic_slice(depth, (i * M,), (M,))
    xn = (c[:, 0] - cx) / fx
    yn = (c[:, 1] - cy) / fy
    X0 = jnp.stack([xn, yn, jnp.ones(M), d], axis=-1)
    Gij = lie.se3_mul(poses[j], lie.se3_inv(poses[i]))

    def proj(X):
        Z = jnp.maximum(X[..., 2], 0.1)
        return jnp.stack([fx * X[..., 0] / Z + cx,
                          fy * X[..., 1] / Z + cy], axis=-1), X[..., 2]

    X1 = lie.se3_act4(Gij[None], X0)
    co1, Z1 = proj(X1)
    Xt = X0.at[..., :3].add(d[:, None] * Gij[:3][None])
    co2, _ = proj(Xt)
    co0 = c
    f1 = jnp.linalg.norm(co1 - co0, axis=-1)
    f2 = jnp.linalg.norm(co2 - co0, axis=-1)
    val = (Z1 > 0.2)
    flow = beta * f1 + (1 - beta) * f2
    # reference takes a plain mean over the edge's P x P grid; centers-only
    # is the same statistic
    return flow.mean()


def _slot_of(fslot, idx):
    """Ring slot of each frame index (one-hot MXU gather; values < pmem are
    exact in f32)."""
    from ..ba_pairs import gather_rows
    out = gather_rows(fslot.astype(jnp.float32).reshape(-1, 1),
                      jnp.maximum(idx, 0))
    return out.reshape(idx.shape).astype(jnp.int32)


def _pair_neighbors(pi, pj, pvalid, GP):
    """Per-pair previous/next pair with the same source frame, ordered by
    target frame (replaces fastba.neighbors, ba.cpp:59-97).

    COST: O(GP^2) via two (GP, GP) masks, twice per tracked frame. At the
    default cap (GP = 512, _gp_cap) that is 0.26M-entry elementwise work —
    noise next to the corr kernel. GP grows ~linearly with PATCH_LIFETIME
    and REMOVAL_WINDOW, so extreme overrides (say both 4x, GP ~ 2048) pay
    16x here; if profiles ever show this hot, sort pairs by (pi, pj) and
    take adjacent-run neighbors in O(GP log GP) instead."""
    same_i = (pi[:, None] == pi[None, :]) & pvalid[:, None] & pvalid[None, :]
    dj = pj[None, :] - pj[:, None]          # [g, g2]
    before = same_i & (dj < 0)
    after = same_i & (dj > 0)
    big = jnp.int32(10 ** 6)
    # previous: largest pj below
    prev_key = jnp.where(before, pj[None, :], -big)
    prev = jnp.argmax(prev_key, axis=1)
    has_prev = jnp.max(prev_key, axis=1) > -big
    next_key = jnp.where(after, -pj[None, :], -big)
    nxt = jnp.argmax(next_key, axis=1)
    has_next = jnp.max(next_key, axis=1) > -big
    return (jnp.where(has_prev, prev, -1).astype(jnp.int32),
            jnp.where(has_next, nxt, -1).astype(jnp.int32))


def _reproject_pairs(poses, centers, depth, intr, pi, pj, M):
    """(GP, M, P, P, 2) full-patch reprojection from centers."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    c = pair_centers(centers, pi, M)                   # (GP, M, 2)
    d = pair_depth(depth, pi, M)                       # (GP, M)
    off = jnp.arange(-(P // 2), P // 2 + 1, dtype=jnp.float32)
    gx = c[..., 0, None, None] + off[None, None, None, :]
    gy = c[..., 1, None, None] + off[None, None, :, None]
    gx = jnp.broadcast_to(gx, c.shape[:2] + (P, P))
    gy = jnp.broadcast_to(gy, c.shape[:2] + (P, P))
    xn = (gx - cx) / fx
    yn = (gy - cy) / fy
    X0 = jnp.stack([xn, yn, jnp.ones_like(xn),
                    jnp.broadcast_to(d[..., None, None], xn.shape)], axis=-1)
    from ..ba_pairs import gather_rows
    Gij = lie.se3_mul(gather_rows(poses, jnp.maximum(pj, 0)),
                      lie.se3_inv(gather_rows(poses, jnp.maximum(pi, 0))))
    X1 = lie.se3_act4(Gij[:, None, None, None, :], X0)
    Z = jnp.maximum(X1[..., 2], 0.1)
    x1 = fx * X1[..., 0] / Z + cx
    y1 = fy * X1[..., 1] / Z + cy
    return jnp.stack([x1, y1], axis=-1)


def _shift_frames(st, k, n, M, pmem, mem):
    """Keyframe-removal compaction over all frame-indexed buffers."""
    def shift_rows(buf, lo, hi):
        rolled = jnp.roll(buf, -1, axis=0)
        idx = jnp.arange(buf.shape[0])
        m = (idx >= lo) & (idx < hi)
        return jnp.where(m.reshape((-1,) + (1,) * (buf.ndim - 1)), rolled, buf)

    st.poses = shift_rows(st.poses, k, n - 1)
    st.tstamps = shift_rows(st.tstamps, k, n - 1)
    st.colors = shift_rows(st.colors, k, n - 1)
    st.centers = shift_rows(st.centers, k, n - 1)
    st.depth = shift_rows(st.depth, k * M, (n - 1) * M)
    # feature buffers (imap/gmap/fmap1/fmap2) stay PUT: the fslot
    # indirection map shifts instead (slots follow their frames)
    st.fslot = shift_rows(st.fslot, k, n - 1)
    return st


def _permute_int_rows(x, order):
    """(GP,) int/bool permutation via the one-hot MXU gather (values are
    small frame indices — exact in f32; a fancy-index gather lowers to a
    sequential while loop on TPU)."""
    from ..ba_pairs import gather_rows
    out = gather_rows(x.astype(jnp.float32).reshape(-1, 1), order)
    return out.reshape(-1).astype(x.dtype)


def _compact_pairs(st):
    """Sort pairs by target frame (invalid last); permute per-pair state.

    Grouping by pj is the frame-resident corr kernel's contract (each pj
    change re-DMAs the fmap slabs, ops/corr_fused.py) — and compaction
    comes for free: invalid pairs sort to the back.  All permutations run
    as one-hot MXU matmuls: fancy-index row gathers lower to sequential
    while loops on TPU (the (GP, M, DIM) net permute alone was ~ms-scale).
    """
    from ..ba_pairs import gather_rows
    BIG = jnp.int32(1 << 20)
    order = jnp.argsort(jnp.where(st.pvalid, st.pj, BIG), stable=True)
    st.pi = _permute_int_rows(st.pi, order)
    st.pj = _permute_int_rows(st.pj, order)
    st.pvalid = _permute_int_rows(st.pvalid, order)
    st.net = gather_rows(st.net, order)
    st.target = gather_rows(st.target, order)
    st.weight = gather_rows(st.weight, order)
    return st


# ---------------------------------------------------------------------------
# the per-frame step
# ---------------------------------------------------------------------------

def _call_oracle(oracle, st, poses, depth, M, GP):
    """Adapt a hybrid-signature oracle to the pair-blocked device state.

    The hybrid oracle contract (runtime/state.py:update_step) takes
    edge-granular (ii, jj, kk) plus (NM, 2, P, P) patch grids; the device
    state stores pair-granular tables and bare centers, so synthesize the
    edge view (only the center tap of patch_xy is real — the stock oracles
    read patch_xy[kk][:, :, P//2, P//2] exclusively).

    ii/jj are remapped through st.tstamps to INPUT-FRAME indices: after a
    keyframe removal the keyframe-local indices shift, but a ground-truth
    oracle indexes its gt trajectory by input frame. Identity map when no
    removal has fired, so removal-free tests are unchanged."""
    marange = jnp.arange(M, dtype=jnp.int32)
    ii_e = jnp.repeat(st.tstamps[st.pi].astype(jnp.int32), M)
    jj_e = jnp.repeat(st.tstamps[st.pj].astype(jnp.int32), M)
    kk_e = (st.pi[:, None] * M + marange[None, :]).reshape(GP * M)
    cent = st.centers.reshape(-1, 2)            # (N*M, 2) edge-granular view
    patch_xy = jnp.broadcast_to(cent[:, :, None, None],
                                cent.shape + (P, P))
    intr_b = jnp.broadcast_to(st.intr[None, :], (st.poses.shape[0], 4))
    return oracle(poses, patch_xy, depth, intr_b, ii_e, jj_e, kk_e)


@partial(jax.jit,
         static_argnames=('M', 'pmem', 'mem', 'W', 'PCF', 'r', 'kf_index',
                          'opt_window', 'removal_window', 'mixed_precision',
                          'corr_impl', 'kf_thresh', 'motion_damping',
                          'motion_model', 'force_accept', 'oracle'),
         donate_argnames=('st',))
def vo_frame(params, st, image, coords, depth_seed, tstamp,
             *, M, pmem, mem, W, PCF, r, kf_index, opt_window,
             removal_window, kf_thresh, motion_damping, motion_model,
             mixed_precision=True, corr_impl='fused', force_accept=False,
             oracle=None):
    """Track one frame entirely on device (reference dpvo.py:377-473).

    oracle: optional static callable with the hybrid runtime's signature
    (poses, patch_xy, depth, intrinsics, ii, jj, kk) -> (target, weight),
    replacing the learned corr+update path — lets accuracy tests drive the
    REAL device-resident state machine (edge schedule, BA, keyframing,
    termination) toward a known trajectory without a checkpoint. patch_xy
    is synthesized from the stored centers (only the center tap is real);
    pair with force_accept=True (no learned motion probe exists).
    """
    n = st.n
    GP = st.pi.shape[0]

    # ---------------- patchify + store ---------------- #
    # normalize in the encoder's own dtype: the f32 intermediate costs
    # ~0.7 ms/frame of pure HWC layout copies before the bf16 convert the
    # encoder made anyway (u8 values are exact in bf16)
    ndt = jnp.bfloat16 if mixed_precision else jnp.float32
    img = image.astype(ndt) * ndt(2.0 / 255.0) - ndt(0.5)
    feats = patchify_frame(params, img, coords,
                           mixed_precision=mixed_precision)

    # motion model (dpvo.py:410-424)
    P1 = st.poses[jnp.maximum(n - 1, 0)]
    P2 = st.poses[jnp.maximum(n - 2, 0)]
    if motion_model == 'DAMPED_LINEAR':
        tc = st.in_times[jnp.maximum(st.counter - 1, 0)]
        tb = st.in_times[jnp.maximum(st.counter - 2, 0)]
        fac = jnp.where(st.counter >= 2,
                        jnp.where(jnp.abs(tb - tc) > 0,
                                  (tstamp - tc) / jnp.maximum(tc - tb, 1e-6),
                                  1.0), 1.0)
        xi = motion_damping * fac * lie.se3_log(
            lie.se3_mul(P1, lie.se3_inv(P2)))
        pose_damped = lie.se3_mul(lie.se3_exp(xi), P1)
    else:
        pose_damped = P1
    pose_init = jnp.where(n > 1, pose_damped, P1)

    # depth init (dpvo.py:426-431)
    med_lo = jnp.maximum(n - 3, 0) * M
    dwin = jax.lax.dynamic_slice(st.depth, (med_lo,), (3 * M,))
    med = jnp.median(dwin)
    depth_init = jnp.where(st.is_init, jnp.full((M,), med), depth_seed)

    st.poses = jax.lax.dynamic_update_slice(st.poses, pose_init[None], (n, 0))
    st.centers = jax.lax.dynamic_update_slice(
        st.centers, feats['patch_xy'][:, :, 1, 1].reshape(1, 2 * M), (n, 0))
    st.depth = jax.lax.dynamic_update_slice(st.depth, depth_init, (n * M,))
    st.colors = jax.lax.dynamic_update_slice(
        st.colors, feats['clr'][None], (n, 0, 0))
    st.tstamps = jax.lax.dynamic_update_slice(
        st.tstamps, st.counter[None], (n,))
    st.in_times = jax.lax.dynamic_update_slice(
        st.in_times, jnp.asarray(tstamp, jnp.float32)[None], (st.counter,))
    # ring-slot allocation via the fslot indirection map: pick the first
    # slot not referenced by any live frame. Keyframe removal then only
    # shifts the 4-byte-per-frame map instead of rolling the ~300 MB of
    # feature slabs (the rolls cost ~4-5 ms/frame when keyframing).
    live_cap = PCF + 2
    live_lo = jnp.maximum(n - live_cap + 1, 0)
    win = jax.lax.dynamic_slice(st.fslot, (live_lo,), (live_cap,))
    pos = jnp.arange(live_cap, dtype=jnp.int32) + live_lo
    used = jnp.zeros((pmem,), jnp.int32).at[
        jnp.where(pos < n, win, pmem)].set(1, mode='drop')
    slot = jnp.argmin(used).astype(jnp.int32)
    st.fslot = st.fslot.at[n].set(slot)

    st.imap = jax.lax.dynamic_update_slice(
        st.imap, feats['imap'].astype(st.imap.dtype), (slot * M, 0))
    st.gmap = jax.lax.dynamic_update_slice(
        st.gmap, feats['gmap'].astype(st.gmap.dtype), (slot * M, 0, 0, 0))
    if corr_impl == 'onepass':
        st.fmap1 = jax.lax.dynamic_update_slice(
            st.fmap1,
            pad_slab1pair(feats['fmap1'][None].astype(st.fmap1.dtype)),
            (slot, 0, 0, 0, 0))
    else:
        st.fmap1 = jax.lax.dynamic_update_slice(
            st.fmap1, pad_slab(feats['fmap1'][None].astype(st.fmap1.dtype)),
            (slot, 0, 0, 0))
    st.fmap2 = jax.lax.dynamic_update_slice(
        st.fmap2, pad_slab2(feats['fmap2'][None].astype(st.fmap2.dtype)),
        (slot, 0, 0, 0, 0))

    # ---------------- probe (pre-init accept test) ---------------- #
    def corr_two_level(pi_a, pj_a, pv_a, net_a, poses, depth):
        coords_r = _reproject_pairs(poses, st.centers, depth, st.intr,
                                    pi_a, pj_a, M)
        E = pi_a.shape[0] * M
        coords_f = coords_r.reshape(E, P, P, 2)
        # gather source patches / context at PAIR granularity — (GP,) rows
        # of M contiguous patches each, not E fine-grained rows
        psl = _slot_of(st.fslot, pi_a)
        kk_slot = (psl[:, None] * M + jnp.arange(M)[None, :]).reshape(E)
        jj_slot = jnp.repeat(_slot_of(st.fslot, pj_a), M)
        from ..ba_pairs import gather_rows
        h4, w4 = image.shape[0] // 4, image.shape[1] // 4
        pre = ((h4, w4), (h4 // 4, w4 // 4))
        if corr_impl == 'onepass':
            # NO g9 pre-gather: kk_slot rows are contiguous per pair, so
            # the kernel DMAs its EB g-rows per block straight from gmap
            ckw = dict(prepadded=pre, rows_contiguous=True)
        else:
            # one-hot MXU gather: the fancy-index form lowers to a
            # sequential 512-iteration while loop moving ~113 MB
            # (~22 ms/frame measured)
            g9 = gather_rows(st.gmap.reshape(pmem, -1), psl)
            ckw = dict(g9=g9.reshape(E, P * P, st.gmap.shape[-1]),
                       prepadded=pre)
        if corr_impl == 'onepass':
            # valid pairs are a compacted prefix: edges past nv skip the
            # MXU dots entirely and emit exact zeros.  NATIVE layout: no
            # relayout transposes (~11 ms/frame at E=49k); the channel
            # permutation is absorbed into update.corr.0's weight rows at
            # driver init (models/vonet.py:permute_params_for_native_corr).
            nv = jnp.sum(pv_a.astype(jnp.int32)) * M
            # bf16 taps out of the kernel = the convert the update op's
            # bf16 corr GEMM did anyway (0.6 ms/frame of convert.165/166)
            c1, c2 = corr_onepass(st.gmap, st.fmap1, st.fmap2, coords_f,
                                  kk_slot, jj_slot, nv=nv, layout='native',
                                  out_dtype=(jnp.bfloat16 if mixed_precision
                                             else jnp.float32), **ckw)
            corr_feat = jnp.concatenate(
                [c1.reshape(E, -1), c2.reshape(E, -1)], axis=-1)
        else:
            c1, c2 = corr_fused(st.gmap, st.fmap1, st.fmap2, coords_f,
                                kk_slot, jj_slot,
                                select_kernel=(corr_impl == 'fused_k'),
                                **ckw)
            corr_feat = jnp.stack([c1, c2], axis=-1).reshape(E, -1)
        inp = gather_rows(st.imap.reshape(pmem, M * DIM), psl).reshape(E, DIM)
        return coords_r, corr_feat, inp

    def probe_delta():
        pi_p = jnp.asarray([0], jnp.int32) + jnp.maximum(n - 1, 0)
        pj_p = pi_p + 1
        pv_p = jnp.ones((1,), bool)
        coords_r, corr_feat, inp = corr_two_level(
            pi_p, pj_p, pv_p, None, st.poses, st.depth)
        net0 = jnp.zeros((M, DIM), st.net.dtype)
        ids = jnp.arange(M, dtype=jnp.int32)
        neg = jnp.full((M,), -1, jnp.int32)
        _, delta, _ = update_op(
            params, net0, inp, corr_feat, neg, neg, ids,
            jnp.zeros((M,), jnp.int32), num_segments=M,
            edge_mask=jnp.ones((M,), bool),
            mixed_precision=mixed_precision)
        nrm = jnp.linalg.norm(delta, axis=-1)
        return jnp.median(nrm)

    if force_accept:
        accept = jnp.asarray(True)
    else:
        probe = jax.lax.cond(st.is_init | (n == 0),
                             lambda: jnp.float32(100.0), probe_delta)
        accept = st.is_init | (n == 0) | (probe >= 2.0)

    # rejected pre-init frame: record identity delta (dpvo.py:441-444)
    st.delta_src = jnp.where(
        accept, st.delta_src,
        st.delta_src.at[st.counter].set(st.counter - 1))
    st.counter = st.counter + 1

    def rejected(st):
        return st

    def accepted(st):
        n1 = n + 1
        was_init = st.is_init
        bootstrap = (n1 == 8) & (~was_init)
        st.is_init = st.is_init | bootstrap
        initialized = st.is_init

        # ---- append pair factors (dpvo.py:457-459) ---- #
        # forward: (i, n1-1) for i in [n1-r, n1-1); backward: (n1-1, j) for
        # j in [n1-r, n1)
        fw_i = n1 - r + jnp.arange(r - 1)
        fw_j = jnp.full((r - 1,), n1 - 1, jnp.int32)
        bw_i = jnp.full((r,), n1 - 1, jnp.int32)
        bw_j = n1 - r + jnp.arange(r)
        new_i = jnp.concatenate([fw_i, bw_i]).astype(jnp.int32)
        new_j = jnp.concatenate([fw_j, bw_j]).astype(jnp.int32)
        new_v = (new_i >= 0) & (new_j >= 0)
        cnt = jnp.sum(st.pvalid)
        K = new_i.shape[0]
        idx = cnt + jnp.cumsum(new_v.astype(jnp.int32)) - 1
        idx = jnp.where(new_v, idx, GP)     # dropped when full/invalid
        st.pi = st.pi.at[idx].set(jnp.maximum(new_i, 0), mode='drop')
        st.pj = st.pj.at[idx].set(jnp.maximum(new_j, 0), mode='drop')
        st.pvalid = st.pvalid.at[idx].set(new_v, mode='drop')
        st.net = st.net.at[idx].set(0.0, mode='drop')
        st.target = st.target.at[idx].set(0.0, mode='drop')
        st.weight = st.weight.at[idx].set(0.0, mode='drop')

        # group pairs by target frame (corr_fused slab-reuse contract)
        st = _compact_pairs(st)

        # ---- update iterations (1 steady / 12 bootstrap) ---- #
        ix_pair, jx_pair = _pair_neighbors(st.pi, st.pj, st.pvalid, GP)
        marange = jnp.arange(M, dtype=jnp.int32)
        ix_e = jnp.where(ix_pair[:, None] >= 0,
                         ix_pair[:, None] * M + marange[None, :],
                         -1).reshape(GP * M)
        jx_e = jnp.where(jx_pair[:, None] >= 0,
                         jx_pair[:, None] * M + marange[None, :],
                         -1).reshape(GP * M)
        # patch groups keyed by source ring slot: slots are unique among
        # live frames (fslot allocator), so the agg segment count drops
        # from GP*M to pmem*M — 14x less h-GEMM/scatter work in soft_agg
        kk_ids = (_slot_of(st.fslot, st.pi)[:, None] * M + marange[None, :]
                  ).reshape(GP * M)
        pair_ids = jnp.repeat(jnp.arange(GP, dtype=jnp.int32), M)
        edge_mask = jnp.repeat(st.pvalid, M)
        t0 = jnp.maximum(n1 - opt_window, 1)
        fbase = jnp.maximum(n1 - (PCF - 2), 0)

        def update_body(_, carry):
            poses, depth, net, target, weight = carry
            if oracle is not None:
                coords_r = _reproject_pairs(poses, st.centers, depth,
                                            st.intr, st.pi, st.pj, M)
                center = coords_r[:, :, P // 2, P // 2, :]
                tgt, wgt = _call_oracle(oracle, st, poses, depth, M, GP)
                mask3 = edge_mask.reshape(GP, M, 1)
                target = jnp.where(mask3, tgt.reshape(GP, M, 2), center)
                weight = jnp.where(mask3, wgt.reshape(GP, M, 2), 0.0)
            else:
                coords_r, corr_feat, inp = corr_two_level(
                    st.pi, st.pj, st.pvalid, net, poses, depth)
                netf = net.reshape(GP * M, DIM)
                netf, delta, wgt = update_op(
                    params, netf, inp, corr_feat, ix_e, jx_e, kk_ids,
                    pair_ids, num_segments=GP * M, edge_mask=edge_mask,
                    mixed_precision=mixed_precision,
                    num_segments_kk=pmem * M, num_segments_ij=GP,
                    gather_pairs=(ix_pair, jx_pair, M))
                net = netf.reshape(GP, M, DIM)
                center = coords_r[:, :, P // 2, P // 2, :]
                target = center + delta.reshape(GP, M, 2)
                weight = jnp.where(edge_mask.reshape(GP, M, 1),
                                   wgt.reshape(GP, M, 2), 0.0)
            poses, depth = bundle_adjust_pairs(
                poses, st.centers, depth, st.intr, target, weight, 1e-4,
                st.pi, st.pj, st.pvalid, t0, n1, fbase,
                M=M, W=W, PCF=PCF, iterations=2)
            return poses, depth, net, target, weight

        n_updates = jnp.where(bootstrap, 12, jnp.where(initialized, 1, 0))
        (st.poses, st.depth, st.net, st.target, st.weight) = jax.lax.fori_loop(
            0, n_updates, update_body,
            (st.poses, st.depth, st.net, st.target, st.weight))

        st.n = n1

        # ---- keyframe decision (dpvo.py:266-310) ---- #
        def keyframe(st):
            i = st.n - kf_index - 1
            j = st.n - kf_index + 1
            mflow = 0.5 * (_center_flow(st.poses, st.centers, st.depth,
                                        st.intr, i, j, M) +
                           _center_flow(st.poses, st.centers, st.depth,
                                        st.intr, j, i, M))

            def remove(st):
                k = st.n - kf_index
                t1 = st.tstamps[k]
                t0k = st.tstamps[k - 1]
                dP = lie.se3_mul(st.poses[k], lie.se3_inv(st.poses[k - 1]))
                st.delta_src = st.delta_src.at[t1].set(t0k)
                st.delta_pose = st.delta_pose.at[t1].set(dP)

                drop = (st.pi == k) | (st.pj == k)
                st.pvalid = st.pvalid & ~drop
                st.pi = jnp.where(st.pi > k, st.pi - 1, st.pi)
                st.pj = jnp.where(st.pj > k, st.pj - 1, st.pj)
                st = _shift_frames(st, k, st.n, M, pmem, mem)
                st.n = st.n - 1
                return st

            st = jax.lax.cond(mflow < kf_thresh, remove, lambda s: s, st)

            # retire pairs outside the window (dpvo.py:305-310)
            st.pvalid = st.pvalid & (st.pi >= st.n - removal_window)
            return _compact_pairs(st)

        st = jax.lax.cond(was_init, keyframe, lambda s: s, st)
        return st

    st = jax.lax.cond(accept, accepted, rejected, st)
    return st


@partial(jax.jit,
         static_argnames=('M', 'pmem', 'mem', 'W', 'PCF', 'opt_window',
                          'mixed_precision', 'corr_impl', 'ht4', 'wd4',
                          'oracle'),
         donate_argnames=('st',))
def vo_refine(params, st, *, M, pmem, mem, W, PCF, opt_window,
              mixed_precision=True, corr_impl='fused', ht4=None, wd4=None,
              oracle=None):
    """One update+BA iteration over the existing pairs (terminate(), which
    runs this 12x — reference dpvo.py:181-183)."""
    GP = st.pi.shape[0]
    n1 = st.n
    if oracle is not None:
        coords_r = _reproject_pairs(st.poses, st.centers, st.depth,
                                    st.intr, st.pi, st.pj, M)
        center = coords_r[:, :, P // 2, P // 2, :]
        tgt, wgt = _call_oracle(oracle, st, st.poses, st.depth, M, GP)
        mask3 = jnp.repeat(st.pvalid, M).reshape(GP, M, 1)
        st.target = jnp.where(mask3, tgt.reshape(GP, M, 2), center)
        st.weight = jnp.where(mask3, wgt.reshape(GP, M, 2), 0.0)
        st.poses, st.depth = bundle_adjust_pairs(
            st.poses, st.centers, st.depth, st.intr, st.target, st.weight,
            1e-4, st.pi, st.pj, st.pvalid,
            jnp.maximum(n1 - opt_window, 1), n1,
            jnp.maximum(n1 - (PCF - 2), 0),
            M=M, W=W, PCF=PCF, iterations=2)
        return st

    ix_pair, jx_pair = _pair_neighbors(st.pi, st.pj, st.pvalid, GP)
    marange = jnp.arange(M, dtype=jnp.int32)
    ix_e = jnp.where(ix_pair[:, None] >= 0,
                     ix_pair[:, None] * M + marange[None, :],
                     -1).reshape(GP * M)
    jx_e = jnp.where(jx_pair[:, None] >= 0,
                     jx_pair[:, None] * M + marange[None, :],
                     -1).reshape(GP * M)
    # source slots alias safely mod pmem (see vo_frame) — tight agg bounds
    kk_ids = (_slot_of(st.fslot, st.pi)[:, None] * M + marange[None, :]
              ).reshape(GP * M)
    pair_ids = jnp.repeat(jnp.arange(GP, dtype=jnp.int32), M)
    edge_mask = jnp.repeat(st.pvalid, M)
    t0 = jnp.maximum(n1 - opt_window, 1)
    fbase = jnp.maximum(n1 - (PCF - 2), 0)

    coords_r = _reproject_pairs(st.poses, st.centers, st.depth, st.intr,
                                st.pi, st.pj, M)
    E = GP * M
    coords_f = coords_r.reshape(E, P, P, 2)
    psl = _slot_of(st.fslot, st.pi)
    kk_slot = (psl[:, None] * M + marange[None, :]).reshape(E)
    jj_slot = jnp.repeat(_slot_of(st.fslot, st.pj), M)
    from ..ba_pairs import gather_rows
    pre = ((ht4, wd4), (ht4 // 4, wd4 // 4))
    if corr_impl == 'onepass':
        nv = jnp.sum(st.pvalid.astype(jnp.int32)) * M
        c1, c2 = corr_onepass(st.gmap, st.fmap1, st.fmap2, coords_f,
                              kk_slot, jj_slot, nv=nv, layout='native',
                              out_dtype=(jnp.bfloat16 if mixed_precision
                                         else jnp.float32), prepadded=pre,
                              rows_contiguous=True)
        # native layout; permuted update.corr.0 rows (see corr_two_level)
        corr_feat = jnp.concatenate(
            [c1.reshape(E, -1), c2.reshape(E, -1)], axis=-1)
    else:
        g9 = gather_rows(st.gmap.reshape(pmem, -1), psl)  # one-hot gather
        c1, c2 = corr_fused(st.gmap, st.fmap1, st.fmap2, coords_f,
                            kk_slot, jj_slot,
                            select_kernel=(corr_impl == 'fused_k'),
                            g9=g9.reshape(E, P * P, st.gmap.shape[-1]),
                            prepadded=pre)
        corr_feat = jnp.stack([c1, c2], axis=-1).reshape(E, -1)
    inp = gather_rows(st.imap.reshape(pmem, M * DIM), psl).reshape(E, DIM)

    netf = st.net.reshape(E, DIM)
    netf, delta, wgt = update_op(
        params, netf, inp, corr_feat, ix_e, jx_e, kk_ids, pair_ids,
        num_segments=E, edge_mask=edge_mask, mixed_precision=mixed_precision,
        num_segments_kk=pmem * M, num_segments_ij=GP,
        gather_pairs=(ix_pair, jx_pair, M))
    st.net = netf.reshape(GP, M, DIM)
    center = coords_r[:, :, P // 2, P // 2, :]
    st.target = center + delta.reshape(GP, M, 2)
    st.weight = jnp.where(edge_mask.reshape(GP, M, 1),
                          wgt.reshape(GP, M, 2), 0.0)
    st.poses, st.depth = bundle_adjust_pairs(
        st.poses, st.centers, st.depth, st.intr, st.target, st.weight, 1e-4,
        st.pi, st.pj, st.pvalid, t0, n1, fbase,
        M=M, W=W, PCF=PCF, iterations=2)
    return st


@partial(jax.jit,
         static_argnames=('M', 'pmem', 'mem', 'W', 'PCF', 'r', 'kf_index',
                          'opt_window', 'removal_window', 'mixed_precision',
                          'corr_impl', 'kf_thresh', 'motion_damping',
                          'motion_model', 'force_accept', 'oracle'),
         donate_argnames=('st',))
def vo_frames(params, st, images, coords, depth_seeds, tstamps,
              *, M, pmem, mem, W, PCF, r, kf_index, opt_window,
              removal_window, kf_thresh, motion_damping, motion_model,
              mixed_precision=True, corr_impl='fused', force_accept=False,
              oracle=None):
    """Track a CHUNK of K frames in ONE dispatch: lax.scan over vo_frame.

    Identical math to K successive vo_frame dispatches (the whole SLAM state
    machine is device-resident, so the scan body is the same traced
    function); amortizes the host/tunnel per-dispatch latency over K frames.
    Used by DeviceVO.track_frames / bench --chunk; latency grows to K frames,
    so the per-frame path remains the default for live streaming.

    images (K,H,W,3) u8; coords (K,M,2) f32; depth_seeds (K,M) f32;
    tstamps (K,) f32.
    """
    kw = dict(M=M, pmem=pmem, mem=mem, W=W, PCF=PCF, r=r, kf_index=kf_index,
              opt_window=opt_window, removal_window=removal_window,
              kf_thresh=kf_thresh, motion_damping=motion_damping,
              motion_model=motion_model, mixed_precision=mixed_precision,
              corr_impl=corr_impl, force_accept=force_accept,
              oracle=oracle)

    def body(carry, xs):
        image, c, d, t = xs
        return vo_frame(params, carry, image, c, d, t, **kw), None

    st, _ = jax.lax.scan(body, st, (images, coords, depth_seeds, tstamps))
    return st


_PACK_STATICS = ('M', 'pmem', 'mem', 'W', 'PCF', 'r', 'kf_index',
                 'opt_window', 'removal_window', 'mixed_precision',
                 'corr_impl', 'kf_thresh', 'motion_damping',
                 'motion_model', 'force_accept', 'oracle')


@partial(jax.jit, static_argnames=_PACK_STATICS, donate_argnames=('st',))
def vo_frame_packed(params, st, image, aux, **kw):
    """vo_frame with coords/depth_seed/tstamp packed into one (M, 4) array
    [x, y, seed, tstamp] — ONE host->device upload instead of three (each
    device_put costs ~2 ms of host/tunnel overhead at 20+ FPS)."""
    return vo_frame(params, st, image, aux[:, :2], aux[:, 2], aux[0, 3], **kw)


def _i420_to_rgb(planes, ht, wd):
    """Device-side I420 (YUV 4:2:0) -> float RGB in [0, 255].

    Video-range BT.601 with 2x2 chroma replication — numerically matches
    cv2.COLOR_YUV2RGB_I420 to <0.7/255 (see tests/test_yuv_ingest.py).
    Camera-native ingest: 1.5 bytes/pixel over the host->device link
    instead of 3 (every deployed camera/ISP emits NV12/I420, and a VO
    system's ingest DMA is half the traffic for free)."""
    y = planes[:ht * wd].reshape(ht, wd).astype(jnp.float32)
    q = ht * wd // 4
    u = planes[ht * wd:ht * wd + q].reshape(ht // 2, wd // 2)
    v = planes[ht * wd + q:].reshape(ht // 2, wd // 2)

    def up2(c):                                   # 2x2 nearest upsample
        c = c.astype(jnp.float32) - 128.0
        return jnp.broadcast_to(c[:, None, :, None],
                                (ht // 2, 2, wd // 2, 2)).reshape(ht, wd)
    U, V = up2(u), up2(v)
    yv = 1.164 * (y - 16.0)
    r = yv + 1.596 * V
    g = yv - 0.392 * U - 0.813 * V
    b = yv + 2.017 * U
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


@partial(jax.jit, static_argnames=_PACK_STATICS + ('ht', 'wd', 'upload'),
         donate_argnames=('st', 'buf'))
def vo_frame_packed1(params, st, buf, *, ht, wd, upload='rgb', **kw):
    """vo_frame from ONE flat uint8 upload: [image bytes | aux bytes].

    upload='rgb':    buf is (ht*wd*3 + M*16,) uint8 — the (ht, wd, 3)
                     image followed by the (M, 4) float32 aux
                     [x, y, seed, tstamp] reinterpreted as bytes.
    upload='yuv420': buf is (ht*wd*3//2 + M*16,) uint8 — I420 planes
                     (color conversion runs on device; halves the
                     per-frame host->device bytes).
    One flat buffer halves the per-frame transfer count vs
    vo_frame_packed (the tunnel charges ~2 ms per device_put)."""
    M = kw['M']
    npix = ht * wd * 3 if upload == 'rgb' else ht * wd * 3 // 2
    if upload == 'rgb':
        image = buf[:npix].reshape(ht, wd, 3)
    else:
        image = _i420_to_rgb(buf[:npix], ht, wd)
    aux4 = jax.lax.bitcast_convert_type(
        buf[npix:].reshape(M, 4, 4), jnp.float32)        # (M, 4)
    return vo_frame(params, st, image, aux4[:, :2], aux4[:, 2],
                    aux4[0, 3], **kw)


@partial(jax.jit, static_argnames=_PACK_STATICS, donate_argnames=('st',))
def vo_frames_packed(params, st, images, aux, **kw):
    """Chunked vo_frames with packed per-frame aux (K, M, 4)."""
    def body(carry, xs):
        image, a = xs
        return vo_frame(params, carry, image, a[:, :2], a[:, 2], a[0, 3],
                        **kw), None

    st, _ = jax.lax.scan(body, st, (images, aux))
    return st


@partial(jax.jit, static_argnames=_PACK_STATICS + ('ht', 'wd', 'upload'),
         donate_argnames=('st', 'bufs'))
def vo_frames_packed1(params, st, bufs, *, ht, wd, upload='rgb', **kw):
    """Chunked vo_frames from K flat uint8 uploads in ONE array.

    bufs is (K, npix + M*16) uint8, each row laid out exactly like
    vo_frame_packed1's buf ([image bytes | (M, 4) f32 aux bytes], with
    npix = ht*wd*3 for 'rgb' or ht*wd*3//2 for 'yuv420').  Combines the
    chunked dispatch amortization of vo_frames with the single-transfer
    camera-native ingest of vo_frame_packed1: one device_put and one
    execute per K frames at 1.5 B/px."""
    M = kw['M']
    npix = ht * wd * 3 if upload == 'rgb' else ht * wd * 3 // 2

    def body(carry, buf):
        if upload == 'rgb':
            image = buf[:npix].reshape(ht, wd, 3)
        else:
            image = _i420_to_rgb(buf[:npix], ht, wd)
        aux4 = jax.lax.bitcast_convert_type(
            buf[npix:].reshape(M, 4, 4), jnp.float32)
        return vo_frame(params, carry, image, aux4[:, :2], aux4[:, 2],
                        aux4[0, 3], **kw), None

    st, _ = jax.lax.scan(body, st, bufs)
    return st
