"""Recall@1 of the native retrieval under perturbations + score stats.

Tuning harness for dpretrieval.cpp constants (hash tables, bits/word, ORB
pyramid): mirrors tests/test_classic_lc.py::test_retrieval_recall_under_
perturbation and additionally prints the true-match vs best-false score
separation (LOOP_RETR_THRESH sensitivity).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import cv2
    from dpvo_tpu.loop_closure.retrieval.retrieval_native import (
        NativeRetrieval)

    rng = np.random.RandomState(7)
    H, W = 120, 160
    base = np.zeros((H + 400, W + 600), np.uint8)
    for _ in range(1500):
        y, x = rng.randint(0, H + 388), rng.randint(0, W + 588)
        base[y:y + rng.randint(3, 12), x:x + rng.randint(3, 12)] = \
            rng.randint(0, 255)

    N = 40
    RAD = 6

    def crop(t):
        s = t if t < N // 2 else N - 1 - t
        return np.stack([base[8 * s:8 * s + H, 14 * s:14 * s + W]] * 3, -1)

    def perturb(img, mode, amt=1.0):
        g = img[..., 0]
        if mode == 'brightness':
            g = np.clip(g.astype(np.float32) * 0.6 + 25, 0, 255)
            g = g.astype(np.uint8)
        elif mode == 'scale':
            Mw = cv2.getRotationMatrix2D((W / 2, H / 2), 0.0, 1.08)
            g = cv2.warpAffine(g, Mw, (W, H))
        elif mode == 'scale12':
            Mw = cv2.getRotationMatrix2D((W / 2, H / 2), 0.0, 1.12)
            g = cv2.warpAffine(g, Mw, (W, H))
        elif mode == 'rotation':
            Mw = cv2.getRotationMatrix2D((W / 2, H / 2), 5.0, 1.0)
            g = cv2.warpAffine(g, Mw, (W, H))
        return np.stack([g] * 3, -1)

    for mode in ('none', 'brightness', 'scale', 'scale12', 'rotation'):
        db = NativeRetrieval(rad=RAD)
        hits, total = 0, 0
        true_scores, miss_scores = [], []
        for t in range(N):
            img = crop(t)
            if t >= N // 2 + RAD and mode != 'none':
                img = perturb(img, mode)
            db.insert_image(np.ascontiguousarray(img))
            if t < N // 2 + RAD:
                continue
            score, j, _ = db.query(t)
            true_j = N - 1 - t
            total += 1
            if j >= 0 and abs(j - true_j) <= 2:
                hits += 1
                true_scores.append(score)
            else:
                miss_scores.append(score)
        r = hits / max(total, 1)
        ts = np.mean(true_scores) if true_scores else 0
        ms = np.mean(miss_scores) if miss_scores else 0
        print(f'{mode:10s} recall@1 {r:.2f}  hit-score {ts:.3f}  '
              f'miss-score {ms:.3f}  n={total}')
        del db


if __name__ == '__main__':
    main()
