"""Camera-native I420 ingest: device-side color conversion parity + smoke.

The DeviceVO runtime can take frames as I420 (YUV 4:2:0) planes — 1.5
bytes/pixel over the host->device link instead of 3 — and reconstruct RGB
on device (reference ingest: decoded RGB frames, dpvo.py:377; every
deployed camera/ISP emits NV12/I420 upstream of that decode).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')


def test_i420_to_rgb_matches_cv2():
    """Device conversion == cv2.COLOR_YUV2RGB_I420 (video-range BT.601)."""
    import jax.numpy as jnp
    from dpvo_tpu.runtime.device_vo import _i420_to_rgb

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (48, 64, 3), np.uint8)
    yuv = cv2.cvtColor(img, cv2.COLOR_RGB2YUV_I420)
    want = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420).astype(np.float32)

    got = np.array(_i420_to_rgb(jnp.asarray(yuv.ravel()), 48, 64))
    # cv2 quantizes to u8 (+-0.5) on top of the shared fixed-point math
    assert np.abs(got - want).max() < 1.0


def test_device_vo_runs_on_yuv_ingest():
    """DeviceVO with UPLOAD_FORMAT=yuv420 tracks frames to a finite state
    and stays close to the RGB-ingest run (same weights, same frames)."""
    from dpvo_tpu.config import cfg as base_cfg
    from dpvo_tpu.runtime.device_driver import DeviceVO

    rng = np.random.RandomState(0)
    frames = [cv2.GaussianBlur(
        rng.randint(0, 255, (64, 96, 3)).astype(np.uint8), (0, 0), 2)
        for _ in range(4)]
    intr = np.array([70.0, 70.0, 48.0, 32.0], np.float32)

    from dpvo_tpu.utils.fetch import fetch

    poses = {}
    for fmt in ('rgb', 'yuv420'):
        cfg = base_cfg.clone()
        cfg.PATCHES_PER_FRAME = 8
        cfg.BUFFER_SIZE = 32
        cfg.UPLOAD_FORMAT = fmt
        slam = DeviceVO(cfg, None, ht=64, wd=96, seed=0)
        slam._static['force_accept'] = True
        for t, f in enumerate(frames):
            slam(t, f, intr)
        # fetch polls readiness first — materializing a PENDING device
        # array directly can stall the tunnel for minutes (ADVICE r3)
        poses[fmt] = np.array(fetch(slam.st.poses[:4]))
        assert np.isfinite(poses[fmt]).all()

    # chroma subsampling perturbs pixels slightly; the state machine and
    # compute graph are identical, so early poses stay in the same regime
    assert np.abs(poses['rgb'] - poses['yuv420']).max() < 0.5


_NPZ = __file__.rsplit('/tests/', 1)[0] + '/artifacts/micro_vonet.npz'


@pytest.mark.slow
@pytest.mark.skipif(not __import__('os').path.exists(_NPZ),
                    reason='run scripts/train_synthetic.py first')
def test_yuv_ingest_accuracy_matches_rgb_with_trained_weights():
    """The BENCHMARKED configuration (camera-native I420 ingest) must be
    accuracy-valid, not just runnable: with the committed trained weights,
    a held-out trajectory tracked through yuv420 ingest stays within the
    learned-certification bar and close to the rgb-ingest result
    (ADVICE r3 #1: the headline FPS ran on an ingest path the accuracy
    evals never exercised)."""
    from dpvo_tpu.config import cfg as base_cfg
    from dpvo_tpu.data_readers.synthetic import make_sequence
    from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
    from dpvo_tpu.runtime import DPVO

    seq = make_sequence(1234, T=25, H=64, W=96, step=0.12)
    images, intr = seq['images'], seq['intrinsics']
    gt = poses_to_trajectory(seq['wfc'], np.arange(len(images)))
    path = float(np.linalg.norm(
        np.diff(seq['wfc'][:, :3], axis=0), axis=1).sum())

    errs = {}
    for fmt in ('rgb', 'yuv420'):
        cfg = base_cfg.clone()
        cfg.BUFFER_SIZE = 128
        cfg.PATCHES_PER_FRAME = 8
        cfg.PATCH_LIFETIME = 6
        cfg.REMOVAL_WINDOW = 12
        cfg.OPTIMIZATION_WINDOW = 10
        cfg.KEYFRAME_THRESH = -1.0
        cfg.MIXED_PRECISION = False
        cfg.UPLOAD_FORMAT = fmt
        slam = DPVO(cfg, _NPZ, ht=64, wd=96, seed=7)
        slam._static['force_accept'] = True
        for t in range(len(images)):
            slam(t, images[t], intr)
        poses, tstamps = slam.terminate()
        errs[fmt] = float(ate_rmse(poses_to_trajectory(poses, tstamps), gt,
                                   correct_scale=True))

    print(f'ingest accuracy: rgb ATE {errs["rgb"]:.4f}, '
          f'yuv420 ATE {errs["yuv420"]:.4f}, path {path:.2f}')
    # chroma subsampling must not break the certification bar...
    assert errs['yuv420'] < 0.15 * path, (errs, path)
    # ...and must stay in the rgb run's regime
    assert errs['yuv420'] < errs['rgb'] + 0.05 * path, (errs, path)


def test_hybrid_runs_on_yuv_ingest():
    """HybridVO honors UPLOAD_FORMAT=yuv420 (I420 plane-stack upload,
    state.py frame_step device-side conversion) and stays close to the
    RGB-ingest run — the SLAM/LC modes ride this runtime, so their ingest
    is half the link bytes too."""
    from dpvo_tpu.config import cfg as base_cfg
    from dpvo_tpu.runtime import HybridVO

    rng = np.random.RandomState(0)
    frames = [cv2.GaussianBlur(
        rng.randint(0, 255, (64, 96, 3)).astype(np.uint8), (0, 0), 2)
        for _ in range(4)]
    intr = np.array([70.0, 70.0, 48.0, 32.0], np.float32)

    poses = {}
    for fmt in ('rgb', 'yuv420'):
        cfg = base_cfg.clone()
        cfg.PATCHES_PER_FRAME = 8
        cfg.BUFFER_SIZE = 32
        cfg.UPLOAD_FORMAT = fmt
        slam = HybridVO(cfg, None, ht=64, wd=96, seed=0)
        assert slam._upload == fmt
        slam.motion_probe = lambda: 100.0
        for t, f in enumerate(frames):
            slam(t, f, intr)
        slam._drain()
        poses[fmt] = slam.poses_np[:4].copy()
        assert np.isfinite(poses[fmt]).all()

    assert np.abs(poses['rgb'] - poses['yuv420']).max() < 0.5
