from .common import run_task  # noqa: F401
