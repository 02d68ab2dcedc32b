from .vonet import VONetParams, patchify_frame, update_op, init_vonet_params
from .checkpoint import load_torch_checkpoint, convert_torch_state_dict

__all__ = [
    'VONetParams', 'patchify_frame', 'update_op', 'init_vonet_params',
    'load_torch_checkpoint', 'convert_torch_state_dict',
]
