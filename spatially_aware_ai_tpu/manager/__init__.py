from .paths import dotdict, get_path
from .manager import InSituManager
from .registry import SceneRegistry
