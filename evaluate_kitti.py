"""KITTI odometry evaluation (reference evaluate_kitti.py parity)."""
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
                                 save_trajectory_tum_format)
from dpvo_tpu.plot_utils import plot_trajectory
from dpvo_tpu.runtime import DPVO


def read_calib_file(filepath):
    data = {}
    with open(filepath) as f:
        for line in f.readlines():
            key, value = line.split(':', 1)
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                pass
    return data


def kitti_image_stream(queue, kittidir, sequence, stride, skip=0):
    images_dir = Path(kittidir) / 'dataset' / 'sequences' / sequence
    image_list = sorted((images_dir / 'image_2').glob('*.png'))[skip::stride]
    calib = read_calib_file(images_dir / 'calib.txt')
    intrinsics = calib['P0'][[0, 5, 2, 6]]

    for t, imfile in enumerate(image_list):
        image = cv2.imread(str(imfile))
        H, W, _ = image.shape
        H, W = H - H % 4, W - W % 4
        image = image[:H, :W]
        queue.put((t, image, intrinsics))
    queue.put((-1, image, intrinsics))


def run(cfg, network, kittidir, sequence, stride=1, viz=False, seed=1234):
    slam = None
    queue = Queue(maxsize=8)
    reader = Process(target=kitti_image_stream,
                     args=(queue, kittidir, sequence, stride, 0))
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


def load_kitti_gt(kittidir, sequence):
    """KITTI poses file: 3x4 row-major world-from-camera matrices."""
    pose_file = Path(kittidir) / 'dataset' / 'poses' / f'{sequence}.txt'
    mats = np.loadtxt(pose_file).reshape(-1, 3, 4)
    positions = mats[:, :, 3]
    # rotation -> quaternion wxyz
    quats = []
    for R in mats[:, :, :3]:
        w = np.sqrt(max(0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
        w = max(w, 1e-8)
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
        quats.append([w, x, y, z])
    return positions, np.asarray(quats)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--network', type=str, default='dpvo.pth')
    parser.add_argument('--config', default='config/default.yaml')
    parser.add_argument('--stride', type=int, default=2)
    parser.add_argument('--viz', action='store_true')
    parser.add_argument('--trials', type=int, default=1)
    parser.add_argument('--kittidir', type=Path, default='datasets/KITTI')
    parser.add_argument('--backend_thresh', type=float, default=32.0)
    parser.add_argument('--plot', action='store_true')
    parser.add_argument('--opts', nargs='+', default=[])
    parser.add_argument('--save_trajectory', action='store_true')
    args = parser.parse_args()

    cfg.merge_from_file(args.config)
    cfg.BACKEND_THRESH = args.backend_thresh
    cfg.merge_from_list(args.opts)

    print('Running with config...')
    print(cfg)

    sequences = [f'{i:02d}' for i in range(11)]

    results = {}
    for sequence in sequences:
        pos_gt, quat_gt = load_kitti_gt(args.kittidir, sequence)

        scene_results = []
        for trial in range(args.trials):
            traj_est, tstamps = run(cfg, args.network, args.kittidir,
                                    sequence, args.stride, args.viz,
                                    seed=1234 + trial)
            n = len(traj_est)
            gt_idx = (np.arange(n) * args.stride).clip(max=len(pos_gt) - 1)
            traj_ref = PoseTrajectory3D(
                positions_xyz=pos_gt[gt_idx],
                orientations_quat_wxyz=quat_gt[gt_idx],
                timestamps=tstamps)
            traj_est_obj = PoseTrajectory3D(
                positions_xyz=traj_est[:, :3],
                orientations_quat_wxyz=traj_est[:, [6, 3, 4, 5]],
                timestamps=tstamps)
            ate_score = ate_rmse(traj_est_obj, traj_ref, correct_scale=True,
                                 max_diff=1e9)
            scene_results.append(ate_score)

            if args.plot:
                Path('trajectory_plots').mkdir(exist_ok=True)
                plot_trajectory(
                    traj_est_obj, traj_ref,
                    f'KITTI {sequence} Trial #{trial + 1} '
                    f'(ATE: {ate_score:.03f})',
                    f'trajectory_plots/KITTI_{sequence}_'
                    f'Trial{trial + 1:02d}.pdf')
            if args.save_trajectory:
                Path('saved_trajectories').mkdir(exist_ok=True)
                save_trajectory_tum_format(
                    traj_est_obj, f'saved_trajectories/KITTI_{sequence}.txt')

        results[sequence] = np.median(scene_results)
        print(sequence, sorted(scene_results))

    xs = []
    for scene in results:
        print(scene, results[scene])
        xs.append(results[scene])
    print('AVG', np.mean(xs))
