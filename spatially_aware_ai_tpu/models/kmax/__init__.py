from .convnext import ConvNeXt, ConvNeXtConfig, CONVNEXT_LARGE
from .model import (
    KMaxDeepLab,
    KMaxConfig,
    KmaxSegmenter,
    panoptic_class_map,
)
from .heuristic import HeuristicSegmenter
from .heuristic import GeometricSegmenter
