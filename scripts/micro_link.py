"""Isolate the per-frame wall budget: link bytes vs dispatch vs device.

Three measurements, each segment-timed (dispatch K, fetch a dependent
value, divide):
  put:    device_put of the per-frame upload buffer only (link bytes).
  comp:   vo_frame dispatches from a DEVICE-RESIDENT buffer (no upload).
  full:   the production loop (pack + put + dispatch).
Run on the real TPU chip.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main():
    import jax
    import jax.numpy as jnp
    from dpvo_tpu.config import cfg
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.utils.fetch import fetch

    cfg.merge_from_file('config/default.yaml')
    cfg.UPLOAD_FORMAT = 'yuv420'
    H, W = 480, 640
    K = 30
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(8)]
    intr = np.array([W * 0.73, W * 0.73, W / 2, H / 2], np.float32)

    slam = DPVO(cfg, None, ht=H, wd=W, seed=0)
    slam._static['force_accept'] = True
    for t in range(30):
        slam(t, frames[t % 8], intr)
    fetch(slam.st.poses[0, 0])

    buf_np = slam._pack_buf(frames[0], 99.0)
    nbytes = buf_np.nbytes

    # ---- put-only: K uploads, then a value depending on all of them ----
    @jax.jit
    def reduce_all(bufs):
        return sum(b.astype(jnp.int32).sum() for b in bufs)

    for rep in range(3):
        t0 = time.perf_counter()
        devs = [jax.device_put(buf_np) for _ in range(K)]
        s = int(reduce_all(devs))
        dt = time.perf_counter() - t0
        print(f'put    rep{rep}: {1e3 * dt / K:6.2f} ms/frame '
              f'({nbytes * K / dt / 1e6:6.1f} MB/s) [{s}]')

    # ---- compute-only: dispatch from a device-resident buffer ----
    from dpvo_tpu.runtime.device_vo import vo_frame_packed1
    import functools
    step = functools.partial(
        vo_frame_packed1, ht=H, wd=W, upload=slam._upload, oracle=None,
        **slam._static)
    # pre-upload one buffer; re-put each iteration from a device copy to
    # respect donation (device->device copy, no host link traffic)
    base = jax.device_put(buf_np)

    @jax.jit
    def clone(b):
        return b + jnp.uint8(0)

    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            slam.st = step(slam.params, slam.st, clone(base))
        fetch(slam.st.poses[0, 0])
        dt = time.perf_counter() - t0
        print(f'comp   rep{rep}: {1e3 * dt / K:6.2f} ms/frame')

    # ---- pack-only host cost ----
    t0 = time.perf_counter()
    for t in range(K):
        slam._pack_buf(frames[t % 8], float(t))
    dt = time.perf_counter() - t0
    print(f'pack   host: {1e3 * dt / K:6.2f} ms/frame')

    # ---- full production loop ----
    for rep in range(3):
        t0 = time.perf_counter()
        for t in range(K):
            slam(100 + rep * K + t, frames[t % 8], intr)
        fetch(slam.st.poses[0, 0])
        dt = time.perf_counter() - t0
        print(f'full   rep{rep}: {1e3 * dt / K:6.2f} ms/frame')


if __name__ == '__main__':
    main()
