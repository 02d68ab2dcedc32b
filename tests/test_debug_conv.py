"""Temporary conv-parity debug (will be folded into test_torch_parity)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dpvo_tpu.models.checkpoint import convert_torch_state_dict  # noqa: E402
from dpvo_tpu.models.extractor import conv2d, instance_norm  # noqa: E402


def test_single_conv_parity():
    torch.manual_seed(0)
    conv = nn.Conv2d(3, 32, 7, stride=2, padding=3)
    inorm = nn.InstanceNorm2d(32)
    sd = {'c.' + k: v for k, v in conv.state_dict().items()}
    params = {k: jnp.asarray(v) for k, v in convert_torch_state_dict(sd).items()}

    x = np.random.RandomState(1).randn(1, 3, 16, 20).astype(np.float32)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x))
        ref_n = inorm(ref).numpy()
        ref = ref.numpy()
    out = conv2d(params, 'c', jnp.asarray(x.transpose(0, 2, 3, 1)), stride=2)
    out_np = np.asarray(out).transpose(0, 3, 1, 2)
    assert out_np.shape == ref.shape
    np.testing.assert_allclose(out_np, ref, atol=1e-4)
    out_n = np.asarray(instance_norm(out)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_n, ref_n, atol=1e-3)
