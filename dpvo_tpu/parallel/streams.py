"""Multi-stream VO serving over a device mesh.

The reference is strictly single-stream/single-GPU. On TPU the natural
scale-out for inference is N independent streams, one per chip: the
device-resident VO state (runtime/device_vo.VOState) is a clean pytree, so a
batch of states shards over the 'dp' mesh axis with shard_map and each chip
runs its own full per-frame step — Pallas kernels and all — with zero
cross-chip traffic (VO streams are independent; collectives are only needed
for training, see train/trainer.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..models.vonet import RES
from ..runtime.device_vo import init_state, vo_frame


class MultiStreamVO:
    """Lockstep tracking of B streams, sharded one-per-device."""

    def __init__(self, cfg, params, ht, wd, intrinsics, mesh=None, seed=1234):
        self.cfg = cfg
        self.ht, self.wd = ht, wd
        self.M = cfg.PATCHES_PER_FRAME
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ('dp',))
        self.mesh = mesh
        self.B = mesh.devices.size
        self.params = params
        self.rng = np.random.RandomState(seed)

        base = init_state(cfg, ht, wd, intrinsics)
        self.states = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.B,) + x.shape), base)
        self.states = jax.device_put(
            self.states, NamedSharding(mesh, PS('dp')))

        static = dict(
            M=self.M, pmem=36, mem=36,
            W=cfg.OPTIMIZATION_WINDOW, PCF=cfg.REMOVAL_WINDOW + 4,
            r=cfg.PATCH_LIFETIME, kf_index=cfg.KEYFRAME_INDEX,
            opt_window=cfg.OPTIMIZATION_WINDOW,
            removal_window=cfg.REMOVAL_WINDOW,
            kf_thresh=float(cfg.KEYFRAME_THRESH),
            motion_damping=float(cfg.MOTION_DAMPING),
            motion_model=cfg.MOTION_MODEL,
            mixed_precision=bool(cfg.MIXED_PRECISION),
            corr_impl='fused',  # shard_map body: keep the portable path
        )

        def step_one(params, st, image, coords, seeds, ts):
            # strip the per-device leading axis of size 1
            st1 = jax.tree.map(lambda x: x[0], st)
            out = vo_frame(params, st1, image[0], coords[0], seeds[0], ts[0],
                           **static)
            return jax.tree.map(lambda x: x[None], out)

        from jax.experimental.shard_map import shard_map
        self._step = jax.jit(shard_map(
            step_one, mesh=mesh,
            in_specs=(PS(), PS('dp'), PS('dp'), PS('dp'), PS('dp'), PS('dp')),
            out_specs=PS('dp'), check_rep=False))

    def __call__(self, tstamps, images):
        """tstamps: (B,) floats; images: (B, H, W, 3) uint8."""
        h4, w4 = self.ht // RES, self.wd // RES
        coords = np.stack([
            np.stack([self.rng.randint(1, w4 - 1, self.M),
                      self.rng.randint(1, h4 - 1, self.M)], -1)
            for _ in range(self.B)]).astype(np.float32)
        seeds = self.rng.rand(self.B, self.M).astype(np.float32)
        sh = NamedSharding(self.mesh, PS('dp'))
        self.states = self._step(
            self.params, self.states,
            jax.device_put(np.ascontiguousarray(images), sh),
            jax.device_put(coords, sh), jax.device_put(seeds, sh),
            jax.device_put(np.asarray(tstamps, np.float32), sh))
