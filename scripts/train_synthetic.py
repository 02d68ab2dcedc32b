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


def build_batch_pool(n_seqs, T, M, H, W, step, seed0=100, loop_frac=0.0):
    """loop_frac > 0 renders that fraction of scenes with out-and-back
    (reversal) trajectories: forward-only pools leave direction reversals
    out of distribution and the net drifts badly on revisit sequences
    (the DPV-SLAM loop-closure regime)."""
    from dpvo_tpu.data_readers.synthetic import make_sequence
    every = max(int(round(1.0 / loop_frac)), 1) if loop_frac > 0 else 0
    seqs = [make_sequence(seed0 + i, T=T, H=H, W=W, step=step,
                          loop=bool(every and i % every == 1))
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
    ap.add_argument('--noise-steps', type=int, default=0,
                    help='pose-curriculum phase length AFTER the structure '
                    'phase: the unroll initializes its first window at '
                    'noisy-GT poses with noise ramping 0 -> --noise-max '
                    '(the near-truth init regime the runtime operates in) '
                    'before the final identity-init phase')
    ap.add_argument('--noise-max', type=float, default=0.35)
    ap.add_argument('--loop-frac', type=float, default=0.0,
                    help='fraction of training scenes rendered with '
                    'out-and-back (reversal) trajectories')
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--pool', type=int, default=32)
    ap.add_argument('--T', type=int, default=15)
    ap.add_argument('--M', type=int, default=8)
    ap.add_argument('--H', type=int, default=64)
    ap.add_argument('--W', type=int, default=96)
    ap.add_argument('--unroll', type=int, default=14)
    ap.add_argument('--motion-step', type=float, default=0.12)
    ap.add_argument('--val-every', type=int, default=500,
                    help='run the full-runtime ATE on validation scenes '
                    'every K steps and keep the BEST checkpoint (long runs '
                    'can drift past their best weights; selecting on a '
                    'val sequence makes training length monotone-safe)')
    ap.add_argument('--val-seeds', type=int, nargs='+', default=[800, 801])
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

    from dpvo_tpu.data_readers.synthetic import make_sequence

    if not args.eval_only:
        print(f'[train] backend={jax.default_backend()} '
              f'pool={args.pool} B={args.batch} T={args.T} M={args.M} '
              f'{args.H}x{args.W} unroll={args.unroll}')
        t0 = time.time()
        seqs = build_batch_pool(args.pool, args.T, args.M, args.H, args.W,
                                args.motion_step, loop_frac=args.loop_frac)
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

        val_seqs = [make_sequence(s, T=30, H=args.H, W=args.W,
                                  step=args.motion_step)
                    for s in args.val_seeds]
        if args.loop_frac > 0:
            # selection must see the reversal regime too (test_dpv_slam's
            # loop sequence), or best-checkpoint picking optimizes away
            # exactly what loop training adds
            val_seqs.append(make_sequence(820, T=40, H=args.H, W=args.W,
                                          step=args.motion_step, loop=True))
        tmp_npz = npz_path + '.tmp.npz'

        def val_ate(ps):
            save_params_npz({k: np.asarray(v) for k, v in ps.items()},
                            tmp_npz)
            ates = [run_vo_ate(tmp_npz, sq)[0] for sq in val_seqs]
            print('[val]   per-seq: '
                  + ' '.join(f'{a:.4f}' for a in ates), flush=True)
            return float(np.mean(ates))

        best = (np.inf, -1)
        rng = np.random.RandomState(0)
        t0 = time.time()
        from dpvo_tpu.runtime import numpy_se3 as nse3
        s1 = args.structure_steps
        s2 = s1 + args.noise_steps
        for it in range(args.steps):
            idx = rng.choice(len(seqs), args.batch, replace=False)
            batch = assemble_batch(seqs, idx, rng, args.M)
            if s1 <= it < s2:
                # pose curriculum: first-window init = GT * exp(noise),
                # noise ramping up over the phase (rotation at half the
                # translation scale)
                sig = args.noise_max * (it - s1 + 1) / max(s2 - s1, 1)
                gt = batch['poses_gt']                       # (B, T, 7) w2c
                B, T = gt.shape[:2]
                xi = rng.randn(B, T, 6).astype(np.float32) * sig
                xi[..., 3:] *= 0.5
                batch['gs_init'] = nse3.mul(
                    gt.reshape(-1, 7),
                    nse3.exp(xi.reshape(-1, 6))).reshape(B, T, 7)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            fn = step_so if it < s1 else step_full
            params, opt_state, loss, aux = fn(params, opt_state, batch)
            if it % 50 == 0 or it == args.steps - 1:
                ax = {k: float(v.mean()) for k, v in aux.items()}
                print(f'[train] it={it:5d} loss={float(loss):9.4f} '
                      + ' '.join(f'{k}={v:.4f}' for k, v in sorted(ax.items()))
                      + f' ({(time.time()-t0):.0f}s)', flush=True)
            last = it == args.steps - 1
            if args.val_every and it >= args.structure_steps and (
                    (it - args.structure_steps) % args.val_every == 0 or last):
                v = val_ate(params)
                if v < best[0]:
                    best = (v, it)
                    save_params_npz({k: np.asarray(v2)
                                     for k, v2 in params.items()}, npz_path)
                print(f'[val] it={it:5d} ate={v:.4f} '
                      f'best={best[0]:.4f}@{best[1]}', flush=True)
        if not np.isfinite(best[0]):     # val disabled: keep final weights
            save_params_npz({k: np.asarray(v) for k, v in params.items()},
                            npz_path)
        if os.path.exists(tmp_npz):
            os.remove(tmp_npz)
        print(f'[train] saved {npz_path} (best val ATE '
              f'{best[0]:.4f} at it={best[1]})')

    # ---- held-out evaluation: trained vs random weights ----
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
    results['config'] = {k: v for k, v in vars(args).items()
                         if k not in ('out', 'resume', 'eval_only')}
    with open(json_path, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
