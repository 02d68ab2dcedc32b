"""Train a micro-VONet on synthetic scenes and certify the LEARNED loop.

No dataset or checkpoint exists in this environment, so this script is the
in-repo substitute for the reference's TartanAir training + logs/*.txt
regression protocol (reference train.py:44-171, evaluate_tartan.py:129-146):

  1. trains VONet with the real train step (dpvo_tpu/train/trainer.py) on
     rendered slanted-plane scenes with exact GT (data_readers/synthetic.py),
  2. runs the FULL runtime (patchify -> corr -> update -> BA -> keyframing
     -> terminate) with the trained weights on a HELD-OUT synthetic
     sequence,
  3. writes artifacts/micro_vonet.npz + artifacts/synthetic_ate.json with
     the trained-vs-random ATE numbers that tests/test_learned_ate.py
     asserts on.

Run on the TPU chip (default) or CPU (slow):
    python scripts/train_synthetic.py --steps 2000
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def build_batch_pool(n_seqs, T, M, H, W, step, seed0=100):
    from dpvo_tpu.data_readers.synthetic import make_sequence
    seqs = [make_sequence(seed0 + i, T=T, H=H, W=W, step=step)
            for i in range(n_seqs)]
    return seqs


def assemble_batch(seqs, idx, rng, M):
    from dpvo_tpu.data_readers.synthetic import make_batch_from
    return make_batch_from([seqs[i] for i in idx], rng, M)


def run_vo_ate(params_path, seq, force_accept=True, seed=7):
    """Full runtime rollout on a sequence; returns Sim3-aligned ATE."""
    import jax.numpy as jnp
    from dpvo_tpu import lie
    from dpvo_tpu.config import cfg as base_cfg
    from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
    from dpvo_tpu.runtime import DPVO

    images = seq['images']
    T, H, W, _ = images.shape
    intr = seq['intrinsics']

    cfg = base_cfg.clone()
    cfg.BUFFER_SIZE = 128
    cfg.PATCHES_PER_FRAME = 8
    cfg.PATCH_LIFETIME = 6
    cfg.REMOVAL_WINDOW = 12
    cfg.OPTIMIZATION_WINDOW = 10
    cfg.KEYFRAME_THRESH = -1.0        # keep every frame: pure-VO accuracy
    cfg.MIXED_PRECISION = False

    slam = DPVO(cfg, params_path, ht=H, wd=W, seed=seed)
    if hasattr(slam, '_static'):
        slam._static['force_accept'] = force_accept
    elif force_accept:
        slam.motion_probe = lambda: 100.0

    for t in range(T):
        slam(t, images[t], intr)
    poses, tstamps = slam.terminate()

    gt_wfc = seq['wfc']
    est = poses_to_trajectory(poses, tstamps)
    gt = poses_to_trajectory(gt_wfc, np.arange(T))
    err = float(ate_rmse(est, gt, correct_scale=True))
    path = float(np.linalg.norm(np.diff(gt_wfc[:, :3], axis=0),
                                axis=1).sum())
    return err, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=2000)
    ap.add_argument('--structure-steps', type=int, default=400)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--pool', type=int, default=32)
    ap.add_argument('--T', type=int, default=15)
    ap.add_argument('--M', type=int, default=8)
    ap.add_argument('--H', type=int, default=64)
    ap.add_argument('--W', type=int, default=96)
    ap.add_argument('--unroll', type=int, default=14)
    ap.add_argument('--motion-step', type=float, default=0.12)
    ap.add_argument('--out', default='artifacts')
    ap.add_argument('--resume', default=None,
                    help='continue from a saved .npz instead of fresh init')
    ap.add_argument('--eval-only', action='store_true')
    args = ap.parse_args()

    import jax
    # persistent compilation cache: re-runs with unchanged shapes skip the
    # multi-minute XLA compile (best-effort; harmless if the backend
    # doesn't support it)
    try:
        cd = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.cache', 'jax')
        os.makedirs(cd, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cd)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception as e:
        print(f'[train] compilation cache unavailable: {e}')
    import jax.numpy as jnp
    from dpvo_tpu.models.checkpoint import save_params_npz
    from dpvo_tpu.models.vonet import init_vonet_params
    from dpvo_tpu.train.trainer import (edge_schedule, make_optimizer,
                                        make_train_step)

    os.makedirs(args.out, exist_ok=True)
    npz_path = os.path.join(args.out, 'micro_vonet.npz')
    json_path = os.path.join(args.out, 'synthetic_ate.json')

    if not args.eval_only:
        print(f'[train] backend={jax.default_backend()} '
              f'pool={args.pool} B={args.batch} T={args.T} M={args.M} '
              f'{args.H}x{args.W} unroll={args.unroll}')
        t0 = time.time()
        seqs = build_batch_pool(args.pool, args.T, args.M, args.H, args.W,
                                args.motion_step)
        print(f'[train] rendered {args.pool} seqs in {time.time()-t0:.1f}s')

        sched = edge_schedule(args.T, args.M, args.unroll)
        if args.resume:
            from dpvo_tpu.models.checkpoint import load_params_npz
            params = {k: jnp.asarray(v)
                      for k, v in load_params_npz(args.resume).items()}
            print(f'[train] resumed from {args.resume}')
        else:
            params = {k: jnp.asarray(v)
                      for k, v in init_vonet_params(0).items()}
        opt = make_optimizer(lr=args.lr, total_steps=args.steps)
        opt_state = opt.init(params)

        step_so = make_train_step(opt, sched, structure_only=True,
                                  mixed_precision=False)
        step_full = make_train_step(opt, sched, structure_only=False,
                                    mixed_precision=False)

        rng = np.random.RandomState(0)
        t0 = time.time()
        for it in range(args.steps):
            idx = rng.choice(len(seqs), args.batch, replace=False)
            batch = assemble_batch(seqs, idx, rng, args.M)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            fn = step_so if it < args.structure_steps else step_full
            params, opt_state, loss, aux = fn(params, opt_state, batch)
            if it % 50 == 0 or it == args.steps - 1:
                print(f'[train] it={it:5d} loss={float(loss):9.4f} '
                      f'({(time.time()-t0):.0f}s)', flush=True)
            if it and it % 200 == 0:
                save_params_npz({k: np.asarray(v)
                                 for k, v in params.items()}, npz_path)
        save_params_npz({k: np.asarray(v) for k, v in params.items()},
                        npz_path)
        print(f'[train] saved {npz_path}')

    # ---- held-out evaluation: trained vs random weights ----
    from dpvo_tpu.data_readers.synthetic import make_sequence
    results = {}
    for name, net in (('trained', npz_path), ('random', None)):
        errs, paths = [], []
        for seed in (900, 901):
            seq = make_sequence(seed, T=30, H=args.H, W=args.W,
                                step=args.motion_step)
            e, p = run_vo_ate(net, seq)
            errs.append(e)
            paths.append(p)
            print(f'[eval] {name} seed={seed}: ATE {e:.4f} (path {p:.2f})',
                  flush=True)
        results[f'ate_{name}'] = errs
        results['path_len'] = paths

    results['ate_trained_mean'] = float(np.mean(results['ate_trained']))
    results['ate_random_mean'] = float(np.mean(results['ate_random']))
    results['steps'] = args.steps
    with open(json_path, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
