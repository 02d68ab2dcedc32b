from .patchify import extract_patches, avg_pool2d, pyramidify
from .corr import corr
from .scatter import segment_softmax, segment_sum, segment_mean

__all__ = [
    'extract_patches', 'avg_pool2d', 'pyramidify', 'corr',
    'segment_softmax', 'segment_sum', 'segment_mean',
]
