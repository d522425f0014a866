from . import semdist  # noqa: F401
