from .attention import attention_core  # noqa: F401
