from . import detection, proposal, targets  # noqa: F401
