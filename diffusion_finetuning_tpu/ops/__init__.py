from . import attention  # noqa: F401
from .attention import set_flash_enabled, flash_supported  # noqa: F401
