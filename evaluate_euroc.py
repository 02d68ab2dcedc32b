"""EuRoC evaluation harness (reference evaluate_euroc.py parity).

Protocol (BASELINE.md): stride 2, N trials with seed 1234+trial, per-scene
median ATE RMSE after Sim3 alignment, AVG of medians.
"""
import argparse
import multiprocessing as _mp

# spawn, not fork: jax is multithreaded by the time readers start
# (reference sets spawn globally, dpvo/dpvo.py:13)
_ctx = _mp.get_context('spawn')
Process, Queue = _ctx.Process, _ctx.Queue
from pathlib import Path

import numpy as np

from dpvo_tpu.config import cfg
from dpvo_tpu.evaluation import (PoseTrajectory3D, ate_rmse,
                                 poses_to_trajectory,
                                 save_trajectory_tum_format)
from dpvo_tpu.plot_utils import plot_trajectory
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.stream import image_stream

SKIP = 0


def run(cfg, network, imagedir, calib, stride=1, viz=False, seed=1234):
    slam = None
    queue = Queue(maxsize=8)
    reader = Process(target=image_stream,
                     args=(queue, imagedir, calib, stride, SKIP))
    reader.start()

    while 1:
        (t, image, intrinsics) = queue.get()
        if t < 0:
            break
        if slam is None:
            H, W, _ = image.shape
            slam = DPVO(cfg, network, ht=H, wd=W, viz=viz, seed=seed)
        slam(t, image, intrinsics)

    reader.join()
    return slam.terminate()


def ate(traj_ref, traj_est, timestamps):
    traj_est = poses_to_trajectory(traj_est, timestamps)
    return ate_rmse(traj_est, traj_ref, correct_scale=True), traj_est


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--network', type=str, default='dpvo.pth')
    parser.add_argument('--config', default='config/default.yaml')
    parser.add_argument('--stride', type=int, default=2)
    parser.add_argument('--viz', action='store_true')
    parser.add_argument('--trials', type=int, default=1)
    parser.add_argument('--eurocdir', default='datasets/EUROC')
    parser.add_argument('--backend_thresh', type=float, default=64.0)
    parser.add_argument('--plot', action='store_true')
    parser.add_argument('--opts', nargs='+', default=[])
    parser.add_argument('--save_trajectory', action='store_true')
    args = parser.parse_args()

    cfg.merge_from_file(args.config)
    cfg.BACKEND_THRESH = args.backend_thresh
    cfg.merge_from_list(args.opts)

    print('Running with config...')
    print(cfg)

    euroc_scenes = [
        'MH_01_easy', 'MH_02_easy', 'MH_03_medium', 'MH_04_difficult',
        'MH_05_difficult', 'V1_01_easy', 'V1_02_medium', 'V1_03_difficult',
        'V2_01_easy', 'V2_02_medium', 'V2_03_difficult',
    ]

    results = {}
    for scene in euroc_scenes:
        imagedir = f'{args.eurocdir}/{scene}/mav0/cam0/data'
        groundtruth = f'datasets/euroc_groundtruth/{scene}.txt'

        scene_results = []
        for trial in range(args.trials):
            traj_est, tstamps = run(cfg, args.network, imagedir,
                                    'calib/euroc.txt', args.stride,
                                    args.viz, seed=1234 + trial)

            gt = np.loadtxt(groundtruth, delimiter=' ')
            traj_ref = PoseTrajectory3D(
                positions_xyz=gt[:, 1:4],
                orientations_quat_wxyz=gt[:, 4:8],
                timestamps=gt[:, 0] / 1e9)
            # timestamps of euroc images are ns indices; we tracked frame idx
            images = sorted(Path(imagedir).glob('*.png'))[::args.stride]
            tss = np.array([float(p.stem) / 1e9 for p in images])[:len(tstamps)]

            err, traj_est_obj = ate(traj_ref, traj_est, tss)
            scene_results.append(err)

            if args.plot:
                Path('trajectory_plots').mkdir(exist_ok=True)
                plot_trajectory(
                    traj_est_obj, traj_ref,
                    title=f'EuRoC {scene} Trial #{trial + 1} (ATE: {err:.03f})',
                    filename=f'trajectory_plots/euroc_{scene}_trial{trial + 1:02d}.pdf')
            if args.save_trajectory:
                Path('saved_trajectories').mkdir(exist_ok=True)
                save_trajectory_tum_format(
                    traj_est_obj, f'saved_trajectories/euroc_{scene}.txt')

        results[scene] = np.median(scene_results)
        print(scene, sorted(scene_results))

    xs = []
    for scene in results:
        print(scene, results[scene])
        xs.append(results[scene])
    print('AVG', np.mean(xs))
