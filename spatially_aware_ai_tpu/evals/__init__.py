from . import scannet, hypersim
from .scannet import eval_scene, summarize
from .hypersim import eval_hypersim
