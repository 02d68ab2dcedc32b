"""Run VO/SLAM on an image directory or video (reference demo.py parity)."""
import argparse
import os
import multiprocessing as _mp

# spawn, not fork: jax is multithreaded by the time readers start
# (reference sets spawn globally, dpvo/dpvo.py:13)
_ctx = _mp.get_context('spawn')
Process, Queue = _ctx.Process, _ctx.Queue
from pathlib import Path

import numpy as np

from dpvo_tpu.config import cfg
from dpvo_tpu.evaluation import (poses_to_trajectory,
                                 save_trajectory_tum_format)
from dpvo_tpu.plot_utils import (plot_trajectory, save_output_for_COLMAP,
                                 save_ply)
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.stream import image_stream, video_stream
from dpvo_tpu.utils import Timer


def run(cfg, network, imagedir, calib, stride=1, skip=0, viz=False,
        timeit=False):
    slam = None
    queue = Queue(maxsize=8)

    if os.path.isdir(imagedir):
        reader = Process(target=image_stream,
                         args=(queue, imagedir, calib, stride, skip))
    else:
        reader = Process(target=video_stream,
                         args=(queue, imagedir, calib, stride, skip))
    reader.start()

    while 1:
        (t, image, intrinsics) = queue.get()
        if t < 0:
            break

        if slam is None:
            H, W, _ = image.shape
            slam = DPVO(cfg, network, ht=H, wd=W, viz=viz)

        with Timer('SLAM', enabled=timeit):
            slam(t, image, intrinsics)

    reader.join()

    points = slam.point_cloud()
    if hasattr(slam, 'colors_np'):
        colors = slam.colors_np[:slam.n].reshape(-1, 3)
    else:
        colors = slam.colors().reshape(-1, 3)

    return slam.terminate(), (points, colors, (*intrinsics, H, W))


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--network', type=str, default='dpvo.pth')
    parser.add_argument('--imagedir', type=str)
    parser.add_argument('--calib', type=str)
    parser.add_argument('--name', type=str, help='name your run', default='result')
    parser.add_argument('--stride', type=int, default=2)
    parser.add_argument('--skip', type=int, default=0)
    parser.add_argument('--config', default='config/default.yaml')
    parser.add_argument('--timeit', action='store_true')
    parser.add_argument('--viz', action='store_true')
    parser.add_argument('--plot', action='store_true')
    parser.add_argument('--opts', nargs='+', default=[])
    parser.add_argument('--save_ply', action='store_true')
    parser.add_argument('--save_html', action='store_true',
                        help='interactive WebGL viewer (one self-contained '
                             '.html: orbit/pan/zoom, frusta + point cloud)')
    parser.add_argument('--save_colmap', action='store_true')
    parser.add_argument('--save_trajectory', action='store_true')
    args = parser.parse_args()

    cfg.merge_from_file(args.config)
    cfg.merge_from_list(args.opts)

    print('Running with config...')
    print(cfg)

    (poses, tstamps), (points, colors, calib) = run(
        cfg, args.network, args.imagedir, args.calib, args.stride, args.skip,
        args.viz, args.timeit)

    trajectory = poses_to_trajectory(poses, tstamps)

    if args.save_ply:
        save_ply(args.name + '.ply', points, colors)

    if args.save_colmap:
        save_output_for_COLMAP(args.name, trajectory, points, colors, *calib)

    if args.save_html:
        from dpvo_tpu.viz.html_viewer import save_html_viewer
        save_html_viewer(args.name + '.html', poses, points, colors,
                         title=args.name)
        print(f'interactive viewer: {args.name}.html')

    if args.save_trajectory:
        Path('saved_trajectories').mkdir(exist_ok=True)
        save_trajectory_tum_format(trajectory,
                                   f'saved_trajectories/{args.name}.txt')

    if args.plot:
        Path('trajectory_plots').mkdir(exist_ok=True)
        plot_trajectory(trajectory, title=f'DPVO-TPU Trajectory {args.name}',
                        filename=f'trajectory_plots/{args.name}.pdf')
