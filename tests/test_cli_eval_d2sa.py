"""CLI evaluate path for the D2SA dataset variant.

The D2SA evaluator differs from COCOA only in where the GT depth order
lives (``amodal_region.order``, reference amodalevalD2SA.py:286,302). The
synthetic fixtures carry geometrically identical regions under BOTH
nestings, so running the full CLI evaluate (detect → unmold → RLE →
AmodalEval → 12-way sweep) on a COCOA-typed and a D2SA-typed copy of the
same dataset must produce identical stats — and the D2SA copy exercises
the ``amodal_region`` nesting through the whole CLI path (VERDICT round-2
item #5)."""

import numpy as np
import pytest

import jax

from sln_amodal_tpu.cli.train import build_parser, run_evaluate
from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.models.sln import init_params
from sln_amodal_tpu.train import checkpoint as ckpt

from fixtures import make_synthetic_dataset
from test_e2e_ap_regression import biased_variables

pytestmark = pytest.mark.slow


def _run_cli_eval(root, data_type, ckpt_path, logs):
    args = build_parser().parse_args([
        "evaluate", "--dataset", str(root), "--data_type", data_type,
        "--image_size", "64", "--model", ckpt_path, "--logs", logs,
    ])
    return run_evaluate(args)


def test_cli_eval_d2sa_matches_cocoa(tmp_path):
    # the same geometry, typed both ways (order keys nested differently)
    root_c = tmp_path / "cocoa"
    root_d = tmp_path / "d2sa"
    make_synthetic_dataset(str(root_c), n_images=3, size=64, subset="val",
                           data_type="COCO")
    make_synthetic_dataset(str(root_d), n_images=3, size=64, subset="val",
                           data_type="D2S")

    # biased checkpoint (verify-skill recipe) so the detector produces real
    # detections; saved at the CLI's inference_config shapes
    cfg = inference_config(image_size=64, name="cocoa")
    template = init_params(cfg, jax.random.PRNGKey(0))
    variables = biased_variables(cfg)
    path = ckpt.save(variables, str(tmp_path), "biased", 1)
    del template, variables

    stats_c = _run_cli_eval(root_c, "COCOA", path, str(tmp_path / "logs"))
    stats_d = _run_cli_eval(root_d, "D2SA", path, str(tmp_path / "logs"))
    assert stats_c is not None and stats_d is not None
    assert set(stats_c) == set(stats_d) and len(stats_c) == 12
    nonzero = 0
    for key in stats_c:
        np.testing.assert_allclose(stats_c[key], stats_d[key], atol=1e-12,
                                   err_msg=key)
        nonzero += int((np.asarray(stats_c[key]) > 0).any())
    assert nonzero >= 2, "comparison is vacuous if every slice is zero"
