from . import money, labels  # noqa: F401
