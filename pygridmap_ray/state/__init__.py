from .manifest import (  # noqa: F401
    checkpointed_write,
    stage_fingerprint,
    validate_output,
)
