"""TUM-RGBD freiburg1 evaluation (reference evaluate_tum.py parity)."""
import argparse
import multiprocessing as _mp

# spawn, not fork: jax is multithreaded by the time readers start
# (reference sets spawn globally, dpvo/dpvo.py:13)
_ctx = _mp.get_context('spawn')
Process, Queue = _ctx.Process, _ctx.Queue
from pathlib import Path

import cv2
import numpy as np

from dpvo_tpu.config import cfg
from dpvo_tpu.evaluation import (PoseTrajectory3D, ate_rmse,
                                 read_tum_trajectory_file,
                                 save_trajectory_tum_format)
from dpvo_tpu.plot_utils import plot_trajectory
from dpvo_tpu.runtime import DPVO

SKIP = 0


def tum_image_stream(queue, scene_dir, sequence, stride, skip=0):
    images_dir = Path(scene_dir) / 'rgb'
    fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3
    K_l = np.array([fx, 0.0, cx, 0.0, fy, cy, 0.0, 0.0, 1.0]).reshape(3, 3)
    d_l = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])

    image_list = sorted(images_dir.glob('*.png'))[skip::stride]
    for imfile in image_list:
        image = cv2.imread(str(imfile))
        image = cv2.undistort(image, K_l, d_l)
        intrinsics = np.asarray([fx, fy, cx, cy])
        # crop distortion boundary (reference evaluate_tum.py:44-48)
        intrinsics[2] -= 16
        intrinsics[3] -= 8
        image = image[8:-8, 16:-16]
        queue.put((float(imfile.stem), image, intrinsics))
    queue.put((-1, image, intrinsics))


def run(cfg, network, scene_dir, sequence, stride=1, viz=False, seed=1234):
    slam = None
    queue = Queue(maxsize=8)
    reader = Process(target=tum_image_stream,
                     args=(queue, scene_dir, sequence, stride, 0))
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
    parser.add_argument('--stride', type=int, default=1)
    parser.add_argument('--viz', action='store_true')
    parser.add_argument('--trials', type=int, default=1)
    parser.add_argument('--tumdir', type=Path, default='datasets/TUM_RGBD')
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

    tum_scenes = [
        'rgbd_dataset_freiburg1_360', 'rgbd_dataset_freiburg1_desk',
        'rgbd_dataset_freiburg1_desk2', 'rgbd_dataset_freiburg1_floor',
        'rgbd_dataset_freiburg1_plant', 'rgbd_dataset_freiburg1_room',
        'rgbd_dataset_freiburg1_rpy', 'rgbd_dataset_freiburg1_teddy',
        'rgbd_dataset_freiburg1_xyz',
    ]

    results = {}
    for scene in tum_scenes:
        scene_dir = args.tumdir / scene
        traj_ref = read_tum_trajectory_file(scene_dir / 'groundtruth.txt')

        scene_results = []
        for trial in range(args.trials):
            traj_est, timestamps = run(cfg, args.network, scene_dir, scene,
                                       args.stride, args.viz,
                                       seed=1234 + trial)
            traj_est_obj = PoseTrajectory3D(
                positions_xyz=traj_est[:, :3],
                orientations_quat_wxyz=traj_est[:, [6, 3, 4, 5]],
                timestamps=timestamps)
            ate_score = ate_rmse(traj_est_obj, traj_ref, correct_scale=True)
            scene_results.append(ate_score)

            if args.plot:
                Path('trajectory_plots').mkdir(exist_ok=True)
                plot_trajectory(
                    traj_est_obj, traj_ref,
                    f'TUM-RGBD {scene} Trial #{trial + 1} '
                    f'(ATE: {ate_score:.03f})',
                    f'trajectory_plots/TUM_{scene}_Trial{trial + 1:02d}.pdf')
            if args.save_trajectory:
                Path('saved_trajectories').mkdir(exist_ok=True)
                save_trajectory_tum_format(
                    traj_est_obj, f'saved_trajectories/TUM_{scene}.txt')

        results[scene] = np.median(scene_results)
        print(scene, sorted(scene_results))

    xs = []
    for scene in results:
        print(scene, results[scene])
        xs.append(results[scene])
    print('AVG', np.mean(xs))
