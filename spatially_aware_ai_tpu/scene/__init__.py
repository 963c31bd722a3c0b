from .colors import (
    COCO_PANOPTIC_CLASSES,
    PREDEFINED_CLASSES,
    PREDEFINED_COLORS,
    NULL_CLASS_ID,
)
from .objects import (
    flood_fill_3d,
    add_object,
    get_obj_counts,
    mark_object_of_interest,
    merge_objects,
    connected_components_3d,
)
