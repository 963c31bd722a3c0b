from .base import Frame, FrameDataset
from .synthetic import SyntheticSceneDataset, SyntheticScene, Box
