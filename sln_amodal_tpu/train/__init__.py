from . import checkpoint, losses, optim, trainer  # noqa: F401
