from .actions import apply_actions, incremental_pipeline  # noqa: F401
