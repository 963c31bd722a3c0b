from .model import CLIPConfig, CLIP, VIT_B_32_QUICKGELU
from .convert import convert_open_clip_state_dict, convert_hf_state_dict
from .tiling import get_patches, tiled_image_features, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
