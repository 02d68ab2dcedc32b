"""Training entry point (reference train.py parity, TPU-native).

Differences from the reference single-GPU loop (train.py:44-171):
  * the whole unroll+loss+grad+update is ONE jitted graph;
  * optional data parallelism over every available TPU chip via
    `jax.sharding.Mesh` ('dp' axis) — batches shard, gradients all-reduce
    over ICI automatically;
  * checkpoints save as .npz (torch-layout convertible both ways).
"""
import argparse
import os
from pathlib import Path

import numpy as np


def prefetch_batches(db, args, rng):
    """Assemble host batches: images/poses/disps/intrinsics + patch coords."""
    import queue
    import threading

    q = queue.Queue(maxsize=4)

    def worker():
        while True:
            seqs = [db[rng.randint(len(db))] for _ in range(args.batch)]
            images = np.stack([s[0] for s in seqs])          # (B,T,H,W,3)
            poses = np.stack([s[1] for s in seqs])           # c2w
            disps = np.stack([s[2] for s in seqs])
            intr = np.stack([s[3][0] for s in seqs])         # (B,4)
            B, T, H, W, _ = images.shape
            M = args.patches_per_frame
            coords = np.stack([
                rng.randint(1, W // 4 - 1, (B, T, M)),
                rng.randint(1, H // 4 - 1, (B, T, M))], axis=-1)
            # disps at feature resolution (reference net.py:193: [1::4, 1::4])
            disps4 = disps[:, :, 1::4, 1::4]
            q.put(dict(images=images.astype(np.float32),
                       poses_c2w=poses.astype(np.float32),
                       disps=disps4.astype(np.float32),
                       intrinsics=intr.astype(np.float32),
                       coords=coords.astype(np.float32),
                       depth_init=rng.rand(B, T, M).astype(np.float32)))

    threading.Thread(target=worker, daemon=True).start()
    while True:
        yield q.get()


def main(args):
    import jax
    import jax.numpy as jnp

    from dpvo_tpu.logger import Logger
    from dpvo_tpu.models.checkpoint import (load_network, save_params_npz)
    from dpvo_tpu.models.vonet import init_vonet_params
    from dpvo_tpu.parallel import make_mesh
    from dpvo_tpu.runtime import numpy_se3 as nse3
    from dpvo_tpu.train.trainer import (edge_schedule, make_optimizer,
                                        make_train_step)
    from dpvo_tpu.data_readers.factory import dataset_factory

    rng = np.random.RandomState(1234)

    db = dataset_factory([args.dataset], datapath=args.datapath,
                         n_frames=args.n_frames)

    if args.ckpt is not None:
        params = {k: jnp.asarray(v)
                  for k, v in load_network(args.ckpt).items()}
    else:
        params = {k: jnp.asarray(v) for k, v in init_vonet_params(0).items()}

    optimizer = make_optimizer(lr=args.lr, total_steps=args.steps,
                               clip=args.clip)
    opt_state = optimizer.init(params)

    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    if mesh is not None:
        assert args.batch % n_dev == 0, 'batch must divide device count'
        print(f'Data-parallel training over {n_dev} devices')

    logger = Logger(args.name)
    steps_warm = edge_schedule(args.n_frames, args.patches_per_frame, 18)

    step_so = make_train_step(optimizer, steps_warm, structure_only=True,
                              mesh=mesh)
    step_full = make_train_step(optimizer, steps_warm, structure_only=False,
                                mesh=mesh)

    total_steps = 0
    for batch in prefetch_batches(db, args, rng):
        # world-to-camera (reference train.py:81: poses = SE3(poses).inv())
        batch['poses_gt'] = nse3.inv(batch.pop('poses_c2w'))
        # per-sequence PRNG keys: enable corr-gradient dropout + random
        # edge removal in the unroll (reference net.py:161-172, 239-244)
        B = batch['images'].shape[0]
        batch['rng'] = rng.randint(0, 2**31 - 1,
                                   (B, 2)).astype(np.uint32)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        so = total_steps < 1000 and args.ckpt is None
        step = step_so if so else step_full
        params, opt_state, loss, aux = step(params, opt_state, batch)

        metrics = {'loss': float(loss)}
        for k, v in aux.items():
            metrics[k] = float(np.mean(np.asarray(v)))
        logger.push(metrics)

        total_steps += 1
        if total_steps % 10000 == 0:
            Path('checkpoints').mkdir(exist_ok=True)
            ckpt_path = f'checkpoints/{args.name}_{total_steps:06d}.npz'
            save_params_npz({k: np.asarray(v) for k, v in params.items()},
                            ckpt_path)
            # in-training validation (reference train.py:144-156 runs
            # evaluate_tartan on the validation split and logs the results)
            if args.validate:
                try:
                    import evaluate_tartan
                    val = evaluate_tartan.evaluate(
                        None, ckpt_path, split='validation', trials=1)
                    logger.write_dict(
                        {f'val/{k}': v for k, v in val.items()})
                    print(f'[val @ {total_steps}] {val}')
                except Exception as e:
                    print(f'WARNING: validation failed: {e}')
        if total_steps >= args.steps:
            break


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--name', default='bla', help='name your experiment')
    parser.add_argument('--ckpt', help='checkpoint to restore')
    parser.add_argument('--steps', type=int, default=240000)
    parser.add_argument('--lr', type=float, default=0.00008)
    parser.add_argument('--clip', type=float, default=10.0)
    parser.add_argument('--n_frames', type=int, default=15)
    parser.add_argument('--batch', type=int, default=1)
    parser.add_argument('--patches_per_frame', type=int, default=80)
    parser.add_argument('--pose_weight', type=float, default=10.0)
    parser.add_argument('--flow_weight', type=float, default=0.1)
    parser.add_argument('--datapath', default='datasets/TartanAir')
    parser.add_argument('--dataset', default='tartan',
                        choices=['tartan', 'synthetic'],
                        help="'synthetic' trains on rendered exact-GT "
                             "scenes (no dataset download needed)")
    parser.add_argument('--validate', action='store_true',
                        help='run evaluate_tartan on the validation split at '
                             'every checkpoint (reference train.py:151)')
    args = parser.parse_args()

    main(args)
