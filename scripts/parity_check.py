#!/usr/bin/env python
"""Inference parity harness vs the reference implementation.

The reference's ``amodal_test.py`` pickles per-image result dicts
(rois / class_ids / scores / masks). Given a directory of those pickles, the
same images, and a converted checkpoint, this tool runs our detector and
reports box/score/mask agreement — the BASELINE.md "mask-level bit parity"
gate, runnable as soon as released checkpoints + datasets are present.

Usage:
    python scripts/parity_check.py --images ./images \
        --model ./checkpoints/COCOA.pth --reference_results ./ref_results \
        [--iou_tol 0.99] [--box_tol 1]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sln_amodal_tpu.config import inference_config  # noqa: E402
from sln_amodal_tpu.utils.runtime import setup_runtime  # noqa: E402


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 1.0


def compare_image(ref: dict, got: dict, box_tol: float, iou_tol: float):
    issues = []
    n_ref, n_got = len(ref["scores"]), len(got["scores"])
    n = min(n_ref, n_got)
    if n_ref != n_got:
        issues.append(f"detection count {n_got} vs reference {n_ref}")
    box_err = (
        np.abs(ref["rois"][:n].astype(np.int64) - got["rois"][:n].astype(np.int64)).max()
        if n
        else 0
    )
    if box_err > box_tol:
        issues.append(f"max box deviation {box_err}px > {box_tol}")
    score_err = (
        float(np.abs(np.asarray(ref["scores"][:n]) - np.asarray(got["scores"][:n])).max())
        if n
        else 0.0
    )
    ious = [
        mask_iou(ref["masks"][:, :, i] > 0, got["masks"][:, :, i] > 0)
        for i in range(n)
    ]
    bad = [i for i, v in enumerate(ious) if v < iou_tol]
    if bad:
        issues.append(f"{len(bad)}/{n} masks below IoU {iou_tol} (min {min(ious):.4f})")
    return issues, dict(
        n=n, box_err=int(box_err), score_err=score_err,
        mean_mask_iou=float(np.mean(ious)) if ious else 1.0,
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--glm_weights", default="./checkpoints/deeplabv2.pth")
    p.add_argument("--reference_results", required=True,
                   help="dir of reference amodal_test.py pickles")
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--box_tol", type=float, default=1.0)
    p.add_argument("--iou_tol", type=float, default=0.99)
    args = p.parse_args()

    setup_runtime()
    import jax
    from PIL import Image

    from sln_amodal_tpu.infer import Detector
    from sln_amodal_tpu.models.sln import init_params
    from sln_amodal_tpu.train import checkpoint as ckpt

    config = inference_config(image_size=args.image_size)
    template = init_params(config, jax.random.PRNGKey(0))
    glm = args.glm_weights if os.path.exists(args.glm_weights) else None
    variables = ckpt.load_weights(args.model, template, glm_path=glm)
    detector = Detector(config, variables)

    names = sorted(
        f for f in os.listdir(args.reference_results) if f.endswith(".json")
    )
    failures = 0
    for name in names:
        stem = os.path.splitext(name)[0]
        image_path = None
        for ext in (".jpg", ".jpeg", ".png"):
            cand = os.path.join(args.images, stem + ext)
            if os.path.exists(cand):
                image_path = cand
                break
        if image_path is None:
            print(f"{stem}: image not found, skipping")
            continue
        with open(os.path.join(args.reference_results, name), "rb") as f:
            ref = pickle.load(f)
        image = np.asarray(Image.open(image_path).convert("RGB"))
        got = detector.detect([image])[0]
        issues, stats = compare_image(ref, got, args.box_tol, args.iou_tol)
        status = "OK" if not issues else "MISMATCH: " + "; ".join(issues)
        print(f"{stem}: n={stats['n']} box_err={stats['box_err']} "
              f"mask_iou={stats['mean_mask_iou']:.4f} — {status}")
        failures += bool(issues)
    print(f"\n{len(names) - failures}/{len(names)} images within tolerance")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
