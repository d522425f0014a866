from . import image, logging  # noqa: F401
