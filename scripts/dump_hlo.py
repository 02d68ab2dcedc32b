"""Dump the compiled HLO of the production vo_frame_packed1 and locate
the ops the profiler flags (reshape.4879 etc.) — what tensor, what layout.

    python scripts/dump_hlo.py reshape.4879 reshape.4882 ...
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re

import numpy as np


def main():
    targets = sys.argv[1:] or ['reshape.4879', 'reshape.4882',
                               'reshape.4883', 'fusion.692',
                               'convert_reduce_fusion.24', 'copy.1806',
                               'copy.1838', 'concatenate.771']
    import jax
    import jax.numpy as jnp
    from dpvo_tpu.config import cfg
    from dpvo_tpu.runtime import DPVO

    cfg.merge_from_file('config/default.yaml')
    cfg.UPLOAD_FORMAT = 'yuv420'
    H, W = 480, 640
    slam = DPVO(cfg, None, ht=H, wd=W, seed=0)
    slam._static['force_accept'] = True
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (H, W, 3), np.uint8)
    intr = np.array([W * 0.73, W * 0.73, W / 2, H / 2], np.float32)
    slam(0.0, img, intr)

    from dpvo_tpu.runtime.device_vo import vo_frame_packed1
    import functools
    buf = jnp.asarray(slam._pack_buf(img, 1.0))
    fn = functools.partial(vo_frame_packed1, ht=H, wd=W,
                           upload=slam._upload, oracle=None, **slam._static)
    txt = jax.jit(fn, donate_argnums=(1,)).lower(
        slam.params, slam.st, buf).compile().as_text()
    print(f'HLO: {len(txt.splitlines())} lines')
    lines = txt.splitlines()
    for tgt in targets:
        pat = re.compile(r'%?' + re.escape(tgt) + r'\b')
        for i, ln in enumerate(lines):
            if pat.search(ln) and ('= ' in ln):
                print('-' * 70)
                print(ln.strip()[:400])
                break


if __name__ == '__main__':
    main()
