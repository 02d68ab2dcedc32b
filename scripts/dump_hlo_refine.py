"""Dump compiled HLO of vo_refine and print the ops the profiler flags.

    python scripts/dump_hlo_refine.py reshape.158 reshape.166 ...
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re

import numpy as np


def main():
    targets = sys.argv[1:] or [
        'reshape.158', 'reshape.166', 'reshape.165', 'reshape.168',
        'reshape.171', 'reshape.173', 'fusion.42', 'fusion.105',
        'fusion.107', 'convert_reduce_fusion.3', 'fusion.90', 'fusion.92',
        'fusion.176', 'fusion.180', 'concatenate.60', 'fusion.8',
        'fusion.9', 'fusion.131', 'fusion.168', 'fusion.169']
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

    from dpvo_tpu.runtime.device_vo import vo_refine
    kw = {k: v for k, v in slam._static.items()
          if k in ('M', 'pmem', 'mem', 'W', 'PCF', 'opt_window',
                   'mixed_precision', 'corr_impl')}
    import functools
    fn = functools.partial(vo_refine.__wrapped__, ht4=H // 4, wd4=W // 4,
                           oracle=None, **kw)
    txt = jax.jit(fn, donate_argnums=(1,)).lower(
        slam.params, slam.st).compile().as_text()
    print(f'HLO: {len(txt.splitlines())} lines')
    lines = txt.splitlines()
    for tgt in targets:
        pat = re.compile(r'%' + re.escape(tgt) + r' = ')
        for ln in lines:
            if pat.search(ln):
                ln = ln.strip()
                meta = ''
                m = re.search(r'metadata=\{[^}]*\}', ln)
                if m:
                    meta = m.group(0)
                head = ln.split(', metadata=')[0].split(', backend_config=')[0]
                print('-' * 70)
                print(head[:330])
                if meta:
                    print('   ' + meta[:330])
                break


if __name__ == '__main__':
    main()
