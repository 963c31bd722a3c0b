from .text import (
    PROMPT_TEMPLATES_85,
    CONTROL_OBJECTS,
    run_query,
    clip_feature_surgery,
    encode_text_with_prompt_ensemble,
    query_relevance_postprocess,
    surgery_relevance_2sigma,
)
from .colormap import turbo_colormap
