from .registry import get_model, register_model, MODEL_REGISTRY  # noqa: F401
