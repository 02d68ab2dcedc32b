"""LEARNED closed-loop accuracy: the one thing oracle tests can't certify.

scripts/train_synthetic.py trains VONet on rendered slanted-plane scenes
and runs the full runtime with the trained weights on held-out sequences,
writing artifacts/micro_vonet.npz + artifacts/synthetic_ate.json. These
tests assert on those artifacts: the trained network must track a
held-out synthetic sequence far better than random weights — certifying
patchify -> correlation -> update operator -> BA -> keyframing ->
terminate *with learning in the loop* (the reference's analogous evidence
is its logs/*.txt regression protocol, evaluate_tartan.py:129-146).

Skipped when the artifacts are absent (they are produced by the training
script, not by CI).
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'artifacts')
_NPZ = os.path.join(_ART, 'micro_vonet.npz')
_JSON = os.path.join(_ART, 'synthetic_ate.json')


@pytest.mark.skipif(not os.path.exists(_JSON),
                    reason='run scripts/train_synthetic.py first')
def test_recorded_trained_ate_beats_random():
    with open(_JSON) as f:
        r = json.load(f)
    assert np.isfinite(r['ate_trained_mean'])
    # trained weights must at least halve the random-weights error
    assert r['ate_trained_mean'] < 0.5 * r['ate_random_mean'], r
    # and be a small fraction of the trajectory scale
    assert r['ate_trained_mean'] < 0.15 * float(np.mean(r['path_len'])), r


@pytest.mark.skipif(not os.path.exists(_NPZ),
                    reason='run scripts/train_synthetic.py first')
def test_trained_weights_track_fresh_holdout():
    """Re-run the full runtime with the committed trained weights on a
    sequence NOT used by the training script's own eval (fresh seed) —
    guards against the recorded JSON going stale vs the code."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(_ART), 'scripts'))
    from train_synthetic import run_vo_ate

    from dpvo_tpu.data_readers.synthetic import make_sequence

    seq = make_sequence(1234, T=25, H=64, W=96, step=0.12)
    err_t, path = run_vo_ate(_NPZ, seq)
    err_r, _ = run_vo_ate(None, seq)
    assert np.isfinite(err_t)
    assert err_t < 0.5 * err_r, (err_t, err_r)
    assert err_t < 0.15 * path, (err_t, path)
