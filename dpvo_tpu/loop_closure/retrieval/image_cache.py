"""Async JPEG spill cache for full-resolution frames.

Mirrors the reference ImageCache
(dpvo/loop_closure/retrieval/image_cache.py:15-72): frames buffer in memory
until safe, then spill asynchronously to a tmpdir as JPEGs for later
keypoint extraction; indices follow keyframe compaction.
"""
from __future__ import annotations

import multiprocessing as mp
import os
from tempfile import TemporaryDirectory

import cv2
import numpy as np

IMEXT = '.jpeg'
JPEG_QUALITY = [int(cv2.IMWRITE_JPEG_QUALITY), 95]
BLANK = np.zeros((500, 500, 3), dtype=np.uint8)


class ImageCache:

    def __init__(self):
        self.image_buffer = {}
        self.tmpdir = TemporaryDirectory()
        self.stored_indices = np.zeros(100000, dtype=bool)
        # spawn, not fork: the parent is JAX-multithreaded, and forking a
        # threaded process can deadlock the child (reference uses a plain
        # fork Pool under torch, image_cache.py:21)
        self.writer_pool = mp.get_context('spawn').Pool(processes=1)
        self.write_result = self.writer_pool.apply_async(
            cv2.imwrite, [f'{self.tmpdir.name}/warmup.png', BLANK,
                          JPEG_QUALITY])
        self._wait()

    def __call__(self, image, n):
        assert isinstance(image, np.ndarray) and image.dtype == np.uint8
        assert image.ndim == 3 and image.shape[2] == 3
        self.image_buffer[n] = image

    def _wait(self):
        self.write_result.wait()

    def _write_image(self, i):
        img = self.image_buffer.pop(i)
        filepath = f'{self.tmpdir.name}/{i:08d}{IMEXT}'
        assert not os.path.exists(filepath)
        self._wait()
        self.write_result = self.writer_pool.apply_async(
            cv2.imwrite, [filepath, img, JPEG_QUALITY])

    def load_frames(self, idxs):
        """Returns a list of HxWx3 uint8 BGR images."""
        self._wait()
        assert np.all(self.stored_indices[idxs])
        frame_list = [f'{self.tmpdir.name}/{i:08d}{IMEXT}' for i in idxs]
        assert all(map(os.path.exists, frame_list))
        return [cv2.imread(f) for f in frame_list]

    def keyframe(self, k):
        tmp = dict(self.image_buffer)
        self.image_buffer.clear()
        for n, v in tmp.items():
            if n != k:
                key = (n - 1) if (n > k) else n
                self.image_buffer[key] = v

    def save_up_to(self, c):
        for n in list(self.image_buffer):
            if n <= c:
                assert not self.stored_indices[n]
                self._write_image(n)
                self.stored_indices[n] = True

    def close(self):
        self._wait()
        self.tmpdir.cleanup()
        self.writer_pool.close()
