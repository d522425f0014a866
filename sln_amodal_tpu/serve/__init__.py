"""AOT export / serving artifacts (capability beyond the reference, which
deploys by re-running the training script's load path)."""

from .export import ServingDetector, export_detector  # noqa: F401
