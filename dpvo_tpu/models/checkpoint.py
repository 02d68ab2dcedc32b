"""Torch .pth checkpoint -> JAX flat param dict converter.

Checkpoint compatibility requirement (reference load path dpvo/dpvo.py:90-111,
train.py:57-62): strip 'module.' prefixes, drop legacy 'update.lmbda' keys,
then per-tensor layout conversion:

  * Conv2d weight (O, I, kH, kW)  ->  (kH, kW, I, O)   [torch OIHW -> HWIO]
  * Linear weight (out, in)       ->  (in, out)
  * biases / LayerNorm params      ->  unchanged

Names are kept verbatim so the functional model code indexes the same keys.
"""
from __future__ import annotations

import numpy as np


def convert_torch_state_dict(state_dict):
    """dict of torch tensors / numpy arrays -> flat name->np.float32 dict."""
    out = {}
    for k, v in state_dict.items():
        if 'update.lmbda' in k:
            continue
        k = k.replace('module.', '')
        a = np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach') else v,
                       dtype=np.float32)
        if a.ndim == 4:                    # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2 and k.endswith('.weight'):
            a = a.T                        # linear (out,in) -> (in,out)
        out[k] = a
    return out


def load_torch_checkpoint(path):
    """Load a reference VONet .pth and convert. Requires torch (CPU ok)."""
    import torch
    state_dict = torch.load(path, map_location='cpu', weights_only=True)
    return convert_torch_state_dict(state_dict)


def save_params_npz(params, path):
    np.savez(path, **params)


def load_params_npz(path):
    z = np.load(path)
    return {k: z[k] for k in z.files}


def load_network(path):
    """Load weights from .pth (torch) or .npz (native) by extension."""
    if str(path).endswith('.npz'):
        return load_params_npz(path)
    return load_torch_checkpoint(path)
