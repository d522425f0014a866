"""Deterministic synthetic checkpoints for tests and benchmarks.

``detection_biased_variables`` builds a checkpoint that produces real
detections WITHOUT training: zeroed RPN/classifier bbox heads make the
detections exactly the top surviving anchors, a +8 foreground class bias
marks them all foreground, and a dithered mask head survives the unmold
path's bytescale quirk. It drives the end-to-end AP regression
(tests/test_e2e_ap_regression.py), the CLI evaluate tests, and the
``eval_pipeline`` wall-clock benchmark in bench.py — the latter needs
~``detection_max_instances`` detections per image so the host-side
unmold + RLE cost it measures matches the reference's operational load
(``/root/reference/amodal_train.py:463-497`` evaluates with
``DETECTION_MIN_CONFIDENCE = 0``, i.e. a full detection table per image).
"""

from __future__ import annotations

import jax
import numpy as np

from ..models.sln import init_params


def rpn_biased_variables(config, seed: int = 0):
    """Fresh init with ONLY the RPN biased to emit the top anchors.

    Zeroed RPN bbox deltas + equal foreground logits make the proposal
    layer emit a deterministic NMS-spread anchor tiling (the same RPN
    trick as :func:`detection_biased_variables`), while the classifier
    and mask heads keep their healthy random init. This is the right
    *training* start for convergence tests: positives flow to the heads
    from step 1 (anchors overlap GT at IoU>=0.5), and the heads start
    from a trainable init instead of the zero-kernel saddle the
    detection-biased checkpoint engineers for deterministic inference
    (measured: training from `detection_biased_variables` collapses —
    the RPN bias is unlearned within ~50 steps, proposals stop
    overlapping GT, and every mrcnn loss drops to exactly 0).
    """
    variables = init_params(config, jax.random.PRNGKey(seed))
    p = variables["params"]
    p["rpn"]["conv_bbox"] = jax.tree_util.tree_map(
        np.zeros_like, p["rpn"]["conv_bbox"])
    p["rpn"]["conv_class"] = jax.tree_util.tree_map(
        np.zeros_like, p["rpn"]["conv_class"])
    rpn_bias = np.zeros_like(np.asarray(p["rpn"]["conv_class"]["bias"]))
    rpn_bias[1::2] = 1.0  # (bg, fg) channel pairs, anchor-major
    p["rpn"]["conv_class"]["bias"] = rpn_bias
    # Detectron-style head init (tiny final cls/bbox layers): with identity
    # frozen-BN stats a random backbone emits large un-normalized features,
    # and default-init final layers then start at huge losses (measured
    # mrcnn_bbox ~160) that clipped SGD oscillates on instead of descending.
    # Near-zero finals start predictions at 0 — loss = log(C) / smooth-L1 of
    # the targets — and gradients well-scaled, so the heads actually train.
    for lin in ("linear_class", "linear_bbox"):
        p["classifier"][lin]["kernel"] = (
            np.asarray(p["classifier"][lin]["kernel"]) * 0.01)
    return variables


def detection_biased_variables(config):
    """Init params biased so inference emits the top anchors as detections.

    See tests/test_e2e_ap_regression.py for the full rationale; the mask
    head is set up as: constant conv4 output (zero kernel, bias 1, identity
    frozen-BN at init) -> per-tap deconv kernel values make a fixed 2x2
    dither (one low tap in four) -> conv5 maps it to layer logits {5, 10}.
    After the unmold bytescale+threshold (reference utils.py:458-459 — a
    CONSTANT mask rescales to all-zeros, hence the dither) the mask is the
    75%-coverage dither of the detection box — deterministic and
    parity-faithful.
    """
    variables = init_params(config, jax.random.PRNGKey(0))
    p = variables["params"]

    def zero(tree, *keys):
        node = tree
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = jax.tree_util.tree_map(np.zeros_like, node[keys[-1]])

    zero(p, "rpn", "conv_bbox")
    zero(p, "classifier", "linear_bbox")
    # equal foreground scores for every anchor -> deterministic, stable
    # proposal order; NMS then tiles the image with kept anchors
    zero(p, "rpn", "conv_class")
    rpn_bias = np.zeros_like(p["rpn"]["conv_class"]["bias"])
    rpn_bias[1::2] = 1.0  # (bg, fg) channel pairs, anchor-major
    p["rpn"]["conv_class"]["bias"] = rpn_bias
    cls_bias = np.zeros_like(p["classifier"]["linear_class"]["bias"])
    cls_bias[1] = 8.0
    p["classifier"]["linear_class"]["bias"] = cls_bias
    zero(p, "mask", "conv4")
    p["mask"]["conv4"]["bias"] = np.ones_like(
        np.asarray(p["mask"]["conv4"]["bias"]))
    dk = np.zeros_like(np.asarray(p["mask"]["deconv"]["kernel"]))
    dk[:, :, 0, :] = 1.0
    dk[0, 0, 0, :] = 0.5
    p["mask"]["deconv"]["kernel"] = dk
    p["mask"]["deconv"]["bias"] = np.zeros_like(
        np.asarray(p["mask"]["deconv"]["bias"]))
    zero(p, "mask", "conv5")
    ck = np.zeros_like(np.asarray(p["mask"]["conv5"]["kernel"]))
    ck[0, 0, 0, 1:] = 10.0
    p["mask"]["conv5"]["kernel"] = ck
    return variables
