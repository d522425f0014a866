from . import anchors, boxes, nms, roi_align  # noqa: F401
