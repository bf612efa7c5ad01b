from .tokenizer import CLIPTokenizer  # noqa: F401
from .dataset import (  # noqa: F401
    OBJECT_TEMPLATE,
    STYLE_TEMPLATE,
    DataLoader,
    DreamBoothDataset,
    PivotalTuningDatasetCapation,
    PromptDataset,
    collate_batch,
)
