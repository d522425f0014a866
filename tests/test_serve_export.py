"""AOT serving artifact: export → load → bit-identical detection.

Covers sln_amodal_tpu/serve/export.py: the jax.export StableHLO roundtrip,
parameter/manifest serialization, request-batch padding, and the CLI.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.infer import Detector
from sln_amodal_tpu.models.sln import init_params
from sln_amodal_tpu.serve.export import ServingDetector, export_detector


def tiny_config(**kw):
    base = dict(
        image_size=128,
        glm_input_size=65,
        pre_nms_limit=200,
        post_nms_rois_inference=50,
        detection_max_instances=10,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = tiny_config()
    variables = init_params(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("artifact"))
    export_detector(cfg, variables, out, batch=2, detect_only=True)
    return cfg, variables, out


def _images(n, size, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (size + 9, size - 7, 3), np.uint8)
            for _ in range(n)]


def test_artifact_files_and_manifest(artifact):
    import json
    import os

    cfg, _, out = artifact
    assert os.path.exists(os.path.join(out, "model.shlo"))
    assert os.path.exists(os.path.join(out, "params.msgpack"))
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["batch"] == 2
    assert manifest["detect_only"] is True
    assert manifest["config"]["image_size"] == cfg.image_size
    assert manifest["outputs"] == ["detections", "det_valid", "masks"]


def test_roundtrip_bit_identical(artifact):
    cfg, variables, out = artifact
    serving = ServingDetector.load(out)
    direct = Detector(cfg, variables)
    images = _images(2, cfg.image_size)
    got = serving.detect(images)
    want = direct.detect(images)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["rois"], w["rois"])
        np.testing.assert_array_equal(g["class_ids"], w["class_ids"])
        np.testing.assert_array_equal(g["scores"], w["scores"])
        np.testing.assert_array_equal(g["masks"], w["masks"])


def test_partial_batch_padding(artifact):
    cfg, variables, out = artifact
    serving = ServingDetector.load(out)
    direct = Detector(cfg, variables)
    images = _images(1, cfg.image_size, seed=3)
    got = serving.detect(images)     # padded 1 -> 2 inside
    want = direct.detect(images)
    assert len(got) == 1
    np.testing.assert_array_equal(got[0]["masks"], want[0]["masks"])
    np.testing.assert_array_equal(got[0]["rois"], want[0]["rois"])


def test_oversize_batch_rejected(artifact):
    _, _, out = artifact
    serving = ServingDetector.load(out)
    with pytest.raises(ValueError, match="artifact batch"):
        serving.detect(_images(3, serving.config.image_size))


def test_loaded_config_tuples_rehashable(artifact):
    # JSON turns tuple fields into lists; the loader must restore tuples or
    # the Config is unhashable and jit dispatch dies
    _, _, out = artifact
    serving = ServingDetector.load(out)
    assert isinstance(serving.config.rpn_anchor_scales, tuple)
    hash(serving.config)


def test_export_cli(tmp_path):
    from sln_amodal_tpu.cli import export_model

    out = str(tmp_path / "art")
    export_model.main([
        "--model", "random", "--out", out, "--batch", "1",
        "--image_size", "128",
    ])
    # CLI default config has glm_input_size=513 — too slow to run on CPU
    # here; loading the artifact (deserialization + manifest) is the check
    serving = ServingDetector.load(out)
    assert serving.batch == 1
    assert serving.config.image_size == 128


def test_full_contract_exports_global_label(tmp_path):
    cfg = tiny_config()
    variables = init_params(cfg, jax.random.PRNGKey(1))
    out = str(tmp_path / "full")
    export_detector(cfg, variables, out, batch=1, detect_only=False)
    serving = ServingDetector.load(out)
    serving.detect(_images(1, cfg.image_size, seed=5))
    assert serving.last_global_label is not None
    assert serving.last_global_label.shape == (1, cfg.image_size, cfg.image_size)


def test_sharded_artifact_matches_single_device(tmp_path):
    from sln_amodal_tpu.parallel.mesh import make_mesh

    cfg = tiny_config()
    variables = init_params(cfg, jax.random.PRNGKey(2))
    mesh = make_mesh(jax.devices()[:4])
    out = str(tmp_path / "spmd")
    export_detector(cfg, variables, out, batch=4, detect_only=True, mesh=mesh)

    import json
    import os
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["mesh_size"] == 4

    serving = ServingDetector.load(out)
    assert serving.mesh is not None and serving.mesh.devices.size == 4
    direct = Detector(cfg, variables)
    images = _images(3, cfg.image_size, seed=7)   # ragged: pads 3 -> 4
    got = serving.detect(images)
    want = direct.detect(images)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["rois"], w["rois"])
        np.testing.assert_array_equal(g["scores"], w["scores"])
        np.testing.assert_array_equal(g["masks"], w["masks"])


def test_sharded_export_batch_divisibility():
    from sln_amodal_tpu.parallel.mesh import make_mesh

    cfg = tiny_config()
    variables = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices()[:4])
    with pytest.raises(ValueError, match="divisible"):
        export_detector(cfg, variables, "/tmp/unused_spmd", batch=3,
                        detect_only=True, mesh=mesh)
