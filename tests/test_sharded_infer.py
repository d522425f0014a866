"""SPMD data-parallel serving: Detector(mesh=...) must produce detections
identical to the single-device path.

The per-image inference pipeline is vmapped, so sharding the batch over a
1-D ('data',) mesh needs no cross-image collectives — XLA just places each
device's shard. What CAN break silently is the host seam: batch padding to
a mesh multiple, params replication, and the collect slice back to the real
image count. This pins all of it on the virtual 8-device CPU mesh
(tests/conftest.py).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.infer import Detector
from sln_amodal_tpu.parallel.mesh import make_mesh
from sln_amodal_tpu.utils.synthetic import detection_biased_variables


def _assert_same(a, b, i=""):
    np.testing.assert_array_equal(a["rois"], b["rois"], err_msg=f"img {i}")
    np.testing.assert_array_equal(a["class_ids"], b["class_ids"])
    np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)
    np.testing.assert_array_equal(a["masks"], b["masks"])


def test_mesh_detect_matches_single_device():
    cfg = inference_config(image_size=64, name="shardinf")
    variables = detection_biased_variables(cfg)

    rng = np.random.RandomState(7)
    # varied raw sizes so mold/unmold are exercised, not just the graph
    images = [
        rng.randint(0, 255, (h, w, 3), np.uint8)
        for h, w in [(64, 64), (48, 80), (96, 56), (64, 72)]
    ]

    base = Detector(cfg, variables).detect(images)
    assert any(r["rois"].shape[0] > 0 for r in base), "vacuous: no detections"

    mesh2 = make_mesh(jax.devices()[:2])
    det2 = Detector(cfg, variables, mesh=mesh2)

    # exact multiple (4 images / 2 devices): no padding
    for i, (s, m) in enumerate(zip(base, det2.detect(images))):
        _assert_same(s, m, i)

    # ragged batch (3 images): pads to 4, REUSING the same compiled
    # program, and collect must drop the pad row
    ragged = det2.detect(images[:3])
    assert len(ragged) == 3
    for i, (s, m) in enumerate(zip(base[:3], ragged)):
        _assert_same(s, m, i)

    # a wider mesh places the same batch one-image-per-device
    det4 = Detector(cfg, variables, mesh=make_mesh(jax.devices()[:4]))
    for i, (s, m) in enumerate(zip(base, det4.detect(images))):
        _assert_same(s, m, i)

    # the eval fast path (collect_crops) under the mesh, via the
    # dispatch/collect pipelining seam the CLI uses
    handle = det2.dispatch(images[:3])
    crops = det2.collect_crops(handle)
    assert len(crops) == 3
    for s, c in zip(base, crops):
        np.testing.assert_array_equal(s["rois"], c["rois"])
        assert len(c["crops"]) == s["rois"].shape[0]
