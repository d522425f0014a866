"""Train→eval convergence regression (VERDICT round-3 item #6).

Everything else in the suite pins *pieces*: losses decrease
(scripts/train_soak.py), a biased checkpoint yields pinned AP
(test_e2e_ap_regression.py). Nothing asserted the one property that
catches a subtly mis-wired loss/target pairing that still reduces loss:
**training must improve detection AP**.

This is the reference's heads-stage recipe scaled way down
(/root/reference/amodal_train.py:642-663) on an 8-image synthetic
rectangle dataset at 64²: ~150 steps over the ROI heads, evaluating the
12-way amodal sweep before and after.

Experiment design — each choice below was forced by a measured failure
mode of the naive setup:

- **From a fresh random init** nothing trains: proposals never overlap
  GT at IoU≥0.5, the detection-target layer emits zero positives, and
  every mrcnn loss is exactly 0 forever (measured).
- **From the detection-biased init** (the inference-engineered
  checkpoint of utils/synthetic.py) training *collapses*: the RPN's
  score-everything bias is unlearned within ~50 steps, proposals stop
  overlapping GT, positives vanish, and AP drops 0.175→0. Its
  zero-kernel mask head is also a saddle that degenerates to p=0.5
  (loss pinned at ln 2), which the unmold bytescale quirk then turns
  into empty masks.
- Therefore: **bias ONLY the RPN and freeze it**
  (utils/synthetic.py::rpn_biased_variables + a custom trainable mask
  over classifier/ and mask/). The frozen anchor-tiling RPN keeps
  positives flowing every step; the heads start from a healthy random
  init (with Detectron-style near-zero final cls/bbox layers — default
  finals on identity-frozen-BN features start at mrcnn_bbox≈160 and
  clipped SGD oscillates instead of descending, measured).

The *only* way AP rises from the before-training 0 is the mrcnn
class/bbox/mask/amodal losses actually teaching the heads — the wiring
this test exists to catch. Calibration run (TPU, 150 steps, lr 1e-3):
AP@.5 0 → 0.125, AR@100 0 → 0.2625, still rising at the step budget.

Runtime: ~10 min on the 1-core CPU host (dominated by the 150 train
steps at ~3 s/step; graph compiles hit the persistent cache). Marked slow.
"""

import os

import numpy as np
import pytest

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.data.dataset import AmodalDataset, DetectionResults
from sln_amodal_tpu.data.pipeline import TrainLoader
from sln_amodal_tpu.eval_amodal.amodal_eval import AmodalEval, evaluate_sweep
from sln_amodal_tpu.eval_amodal.coco_results import build_coco_results
from sln_amodal_tpu.infer import Detector

from fixtures import make_synthetic_dataset

pytestmark = pytest.mark.slow

# Scaled-down stage schedule. 150 steps ≈ 37 epochs over the 8-image set
# at batch 2 — enough to overfit trivially-easy rectangles.
_STEPS = int(os.environ.get("SLN_CONVERGENCE_STEPS", "150"))

def _heads_only(path):
    """The stage: ROI heads only, RPN frozen at its proposal-flowing bias."""
    return path.startswith("classifier/") or path.startswith("mask/")


def _train_config():
    return Config(
        image_size=64,
        glm_input_size=33,
        batch_size=2,
        pre_nms_limit=512,
        post_nms_rois_inference=256,
        post_nms_rois_training=64,
        train_rois_per_image=16,
        detection_max_instances=100,
        max_gt_instances=8,
        rpn_train_anchors_per_image=64,
        compute_dtype="float32",
        name="cocoa",
    )


def _infer_config():
    # Same network shapes; inference posture (min_confidence=0 so the
    # untrained baseline also emits detections and the comparison is
    # AP-vs-AP, not detections-vs-nothing).
    return _train_config().replace(batch_size=1, detection_min_confidence=0.0)


def _sweep(variables, dataset, coco, config):
    """12-way amodal sweep stats for `variables` on the val split."""
    detector = Detector(config, variables)
    results = []
    for image_id in dataset.image_ids:
        image = dataset.load_image(int(image_id))
        r = detector.detect([image])[0]
        results.extend(
            build_coco_results(
                dataset.image_info[int(image_id)]["id"],
                r["rois"], r["class_ids"], r["scores"], r["masks"],
            )
        )
    if not results:
        return None  # zero detections → caller scores the slice 0
    ev = AmodalEval(coco, DetectionResults(results))
    ev.params.img_ids = [
        dataset.image_info[int(i)]["id"] for i in dataset.image_ids
    ]
    return evaluate_sweep(ev, verbose=False)


def _headline(stats):
    """(AP, AP@.5, AR@100) of the both/all slice; zeros if no detections."""
    if stats is None:
        return 0.0, 0.0, 0.0
    s = stats["both/all"]
    return float(s[0]), float(s[1]), float(s[5])


@pytest.fixture(scope="module")
def converged(tmp_path_factory):
    import jax

    root = str(tmp_path_factory.mktemp("conv"))
    make_synthetic_dataset(root, n_images=8, size=64, subset="train")
    make_synthetic_dataset(root, n_images=4, size=64, subset="val", seed=7)

    train_ds = AmodalDataset()
    train_ds.load_amodal(root, "train")
    train_ds.prepare()
    val_ds = AmodalDataset()
    coco = val_ds.load_amodal(root, "val")
    val_ds.prepare()

    cfg = _train_config()
    icfg = _infer_config()
    from sln_amodal_tpu.utils.synthetic import rpn_biased_variables
    variables = rpn_biased_variables(cfg)

    before = _headline(_sweep(variables, val_ds, coco, icfg))

    from sln_amodal_tpu.parallel.mesh import make_mesh
    from sln_amodal_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, variables, mesh=make_mesh(jax.devices()[:1]))
    loader = TrainLoader(train_ds, cfg, batch_size=cfg.batch_size, seed=0)
    losses = trainer.train_stage(
        loader, _heads_only, cfg.learning_rate,
        epochs=1, steps_per_epoch=_STEPS)

    after = _headline(_sweep(trainer.variables, val_ds, coco, icfg))
    return before, after, losses


def test_training_improves_ap(converged):
    before, after, losses = converged
    print(f"\nconvergence: before={before} after={after} "
          f"final_losses={ {k: round(float(v), 3) for k, v in losses.items()} }")
    assert all(np.isfinite(float(v)) for v in losses.values())
    # Training must IMPROVE detection quality, not merely reduce loss.
    assert after[2] > before[2], (before, after)          # AR@100 up
    assert after[1] > before[1], (before, after)          # AP@.5 up
    # Pinned floor on the trained result (calibrated: TPU run reached
    # AP@.5=0.125 / AR@100=0.2625 at 150 steps; floors kept loose —
    # catastrophic mis-wiring lands at exactly 0, not near the floor).
    assert after[2] >= 0.15, (before, after)              # AR@100 floor
    assert after[1] >= 0.04, (before, after)              # AP@.5 floor
