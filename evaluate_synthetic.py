"""Synthetic-scene evaluation — the in-repo regression protocol.

The reference's accuracy regression baseline is its checked-in result logs
(logs/euroc.txt etc.: N trials per sequence, per-scene sorted ATEs, median,
AVG — evaluate_tartan.py:129-146). No dataset exists in this environment,
so this script runs the SAME protocol over rendered exact-GT sequences
(data_readers/synthetic.py) and writes `logs/synthetic_*.txt` in the same
format. With `artifacts/micro_vonet.npz` (scripts/train_synthetic.py) it
certifies the learned loop; with --network none it records the
random-weights floor.

    python evaluate_synthetic.py --trials 3 --network artifacts/micro_vonet.npz
"""
import argparse
import datetime
import os
import sys
from pathlib import Path

import numpy as np

from dpvo_tpu.config import cfg

# the rollout/ATE protocol is OWNED by scripts/train_synthetic.run_vo_ate
# (also what tests/test_learned_ate.py certifies) — one implementation
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'scripts'))
from train_synthetic import run_vo_ate  # noqa: E402

SCENES = {f'synth_{s:03d}': s for s in (900, 901, 902, 903, 904)}
T, H, W, STEP = 30, 64, 96, 0.12


def run_once(seq, network, seed):
    err, _path = run_vo_ate(network, seq, seed=seed)
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--network', default='artifacts/micro_vonet.npz')
    ap.add_argument('--trials', type=int, default=3)
    ap.add_argument('--config', default='config/default.yaml')
    ap.add_argument('--opts', nargs='+', default=[])
    args = ap.parse_args()

    cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    network = None if args.network in ('none', 'None', '') else args.network

    from dpvo_tpu.data_readers.synthetic import make_sequence

    results = {}
    for name, seed in SCENES.items():
        seq = make_sequence(seed, T=T, H=H, W=W, step=STEP)
        results[name] = sorted(
            run_once(seq, network, 1234 + i) for i in range(args.trials))
        print(f'{name}: {results[name]}')

    meds = {k: float(np.median(v)) for k, v in results.items()}
    avg = float(np.mean(list(meds.values())))
    Path('logs').mkdir(exist_ok=True)
    stamp = datetime.datetime.now().strftime('%m-%d-%H-%M')
    tag = 'trained' if network else 'random'
    out = Path('logs') / f'synthetic_{tag}_{stamp}.txt'
    with open(out, 'w') as f:
        for k, v in results.items():
            f.write(f'{k}: {[round(x, 4) for x in v]} '
                    f'median {meds[k]:.4f}\n')
        f.write(f'AVG: {avg:.5f}\n')
    print(f'AVG: {avg:.5f}  -> {out}')


if __name__ == '__main__':
    main()
