from . import attention  # noqa: F401
from .attention import (  # noqa: F401
    clear_flash_overrides,
    flash_supported,
    set_flash_enabled,
    set_flash_override,
)
