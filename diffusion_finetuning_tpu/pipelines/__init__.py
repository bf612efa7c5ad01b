from .pipeline import (  # noqa: F401
    StableDiffusionPipeline,
    apply_learned_embed_in_clip,
    load_learned_embed_in_clip,
    patch_pipe,
    tune_lora_scale_pipe,
)
