"""ICL-NUIM evaluation (reference evaluate_icl_nuim.py parity)."""
import argparse
import glob
import os
import multiprocessing as _mp

# spawn, not fork: jax is multithreaded by the time readers start
# (reference sets spawn globally, dpvo/dpvo.py:13)
_ctx = _mp.get_context('spawn')
Process, Queue = _ctx.Process, _ctx.Queue
from pathlib import Path

import numpy as np

from dpvo_tpu.config import cfg
from dpvo_tpu.evaluation import (PoseTrajectory3D, ate_rmse,
                                 read_tum_trajectory_file,
                                 save_trajectory_tum_format)
from dpvo_tpu.plot_utils import plot_trajectory
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.stream import image_stream


def run(cfg, network, imagedir, calib, stride=1, viz=False, seed=1234):
    slam = None
    queue = Queue(maxsize=8)
    reader = Process(target=image_stream,
                     args=(queue, str(imagedir), calib, stride, 0))
    reader.start()
    while True:
        (t, image, intrinsics) = queue.get()
        if t < 0:
            break
        if slam is None:
            H, W, _ = image.shape
            slam = DPVO(cfg, network, ht=H, wd=W, viz=viz, seed=seed)
        slam(t, image, intrinsics)
    reader.join()
    return slam.terminate()


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--network', type=str, default='dpvo.pth')
    parser.add_argument('--config', default='config/default.yaml')
    parser.add_argument('--stride', type=int, default=2)
    parser.add_argument('--viz', action='store_true')
    parser.add_argument('--trials', type=int, default=1)
    parser.add_argument('--iclnuim_dir', default='datasets/ICL_NUIM',
                        type=Path)
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

    scenes = [
        'living_room_traj0_loop', 'living_room_traj1_loop',
        'living_room_traj2_loop', 'living_room_traj3_loop',
        'office_room_traj0_loop', 'office_room_traj1_loop',
        'office_room_traj2_loop', 'office_room_traj3_loop',
    ]

    results = {}
    for scene in scenes:
        imagedir = args.iclnuim_dir / scene
        if scene.startswith('living'):
            groundtruth = args.iclnuim_dir / 'TrajectoryGT' / \
                f'livingRoom{scene[-6]}.gt.freiburg'
        else:
            groundtruth = args.iclnuim_dir / 'TrajectoryGT' / \
                f'traj{scene[-6]}.gt.freiburg'
        traj_ref = read_tum_trajectory_file(groundtruth)

        scene_results = []
        for i in range(args.trials):
            traj_est, _ = run(cfg, args.network, imagedir,
                              'calib/icl_nuim.txt', args.stride, args.viz,
                              seed=1234 + i)
            images_list = sorted(glob.glob(
                os.path.join(imagedir, '*.png')))[::args.stride]
            tstamps = np.arange(1, len(images_list) + 1, args.stride,
                                dtype=np.float64)[:len(traj_est)]

            traj_est_obj = PoseTrajectory3D(
                positions_xyz=traj_est[:len(tstamps), :3],
                orientations_quat_wxyz=traj_est[:len(tstamps), [6, 3, 4, 5]],
                timestamps=tstamps)
            ate_score = ate_rmse(traj_est_obj, traj_ref, correct_scale=True,
                                 max_diff=0.6)
            scene_results.append(ate_score)

            if args.plot:
                scene_name = scene.rstrip('_loop').title()
                Path('trajectory_plots').mkdir(exist_ok=True)
                plot_trajectory(
                    traj_est_obj, traj_ref,
                    f'ICL_NUIM {scene_name} Trial #{i + 1} '
                    f'(ATE: {ate_score:.03f})',
                    f'trajectory_plots/ICL_NUIM_{scene_name}_'
                    f'Trial{i + 1:02d}.pdf')
            if args.save_trajectory:
                Path('saved_trajectories').mkdir(exist_ok=True)
                save_trajectory_tum_format(
                    traj_est_obj,
                    f'saved_trajectories/ICL_NUIM_{scene}.txt')

        results[scene] = np.median(scene_results)
        print(scene, sorted(scene_results))

    xs = []
    for scene in results:
        print(scene, results[scene])
        xs.append(results[scene])
    print('AVG', np.mean(xs))
