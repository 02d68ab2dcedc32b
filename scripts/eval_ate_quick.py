"""Quick holdout-ATE eval of a weights file under selectable corr impls.

Debugging aid for the learned certification: runs the full runtime on
held-out synthetic sequences (same protocol as scripts/train_synthetic.py)
with DPVO_CORR_IMPL forced, to separate training quality from runtime
kernel/layout bugs (e.g. the native-corr weight permutation).

    python scripts/eval_ate_quick.py artifacts/micro_vonet.npz --impl onepass
    python scripts/eval_ate_quick.py artifacts/micro_vonet.npz --impl fused
"""
import sys, os
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))   # repo root (dpvo_tpu package)
sys.path.insert(0, _here)                    # scripts/ (train_synthetic)
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('weights', nargs='?', default='artifacts/micro_vonet.npz')
    ap.add_argument('--impl', default='',
                    choices=['', 'onepass', 'fused', 'fused_k'])
    ap.add_argument('--seeds', type=int, nargs='+', default=[900, 901, 1234])
    ap.add_argument('--T', type=int, default=30)
    ap.add_argument('--random', action='store_true',
                    help='also run random weights for comparison')
    ap.add_argument('--patches', type=int, default=None,
                    help='override PATCHES_PER_FRAME for the rollout')
    args = ap.parse_args()

    if args.impl:
        os.environ['DPVO_CORR_IMPL'] = args.impl

    from train_synthetic import run_vo_ate
    from dpvo_tpu.data_readers.synthetic import make_sequence

    nets = [('trained', args.weights)] + ([('random', None)] if args.random
                                          else [])
    for name, net in nets:
        for seed in args.seeds:
            seq = make_sequence(seed, T=args.T, H=64, W=96, step=0.12)
            if args.patches:
                e, p = _run_with_patches(net, seq, args.patches)
            else:
                e, p = run_vo_ate(net, seq)
            print(f'[{name}] impl={args.impl or "auto"} seed={seed}: '
                  f'ATE {e:.4f} (path {p:.2f}, {100*e/p:.1f}%)', flush=True)


def _run_with_patches(params_path, seq, M):
    import numpy as np
    from dpvo_tpu.config import cfg as base_cfg
    from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
    from dpvo_tpu.runtime import DPVO

    images = seq['images']
    T, H, W, _ = images.shape
    cfg = base_cfg.clone()
    cfg.BUFFER_SIZE = 128
    cfg.PATCHES_PER_FRAME = M
    cfg.PATCH_LIFETIME = 6
    cfg.REMOVAL_WINDOW = 12
    cfg.OPTIMIZATION_WINDOW = 10
    cfg.KEYFRAME_THRESH = -1.0
    cfg.MIXED_PRECISION = False
    slam = DPVO(cfg, params_path, ht=H, wd=W, seed=7)
    if hasattr(slam, '_static'):
        slam._static['force_accept'] = True
    for t in range(T):
        slam(t, images[t], seq['intrinsics'])
    poses, tstamps = slam.terminate()
    est = poses_to_trajectory(poses, tstamps)
    gt = poses_to_trajectory(seq['wfc'], np.arange(T))
    err = float(ate_rmse(est, gt, correct_scale=True))
    path = float(np.linalg.norm(np.diff(seq['wfc'][:, :3], axis=0),
                                axis=1).sum())
    return err, path


if __name__ == '__main__':
    main()
