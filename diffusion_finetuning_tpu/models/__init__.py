from . import clip_text, layers, schedulers  # noqa: F401
from .clip_text import CLIPTextConfig, CLIPTextModel, text_encoder_lora_targets  # noqa: F401
from .schedulers import (  # noqa: F401
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
    LMSDiscreteScheduler,
    PNDMScheduler,
    SchedulerConfig,
)
