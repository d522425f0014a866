"""Single-image inference CLI — the reference ``amodal_test.py``
(``/root/reference/amodal_test.py:1-63``): run detection over every image in
a directory and dump per-image result dicts.

Usage:
    python -m sln_amodal_tpu.cli.test_images --images ./images \
        --model ./checkpoints/COCOA.pth --out ./results
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import numpy as np
from PIL import Image

from ..config import inference_config
from ..infer import Detector
from ..models.sln import init_params
from ..train import checkpoint as ckpt
from ..utils.logging import log


def main(argv=None) -> None:
    from ..utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="directory of images")
    p.add_argument("--model", required=False, help="checkpoint path")
    p.add_argument("--glm_weights", default="./checkpoints/deeplabv2.pth")
    p.add_argument("--out", default="./results")
    p.add_argument("--image_size", type=int, default=1024)
    args = p.parse_args(argv)

    config = inference_config(image_size=args.image_size)
    template = init_params(config, jax.random.PRNGKey(0))
    variables = template
    if args.model and os.path.exists(args.model):
        glm = args.glm_weights if os.path.exists(args.glm_weights) else None
        variables = ckpt.load_weights(args.model, template, glm_path=glm)
        log(f"Loaded weights {args.model}")
    detector = Detector(config, variables)

    os.makedirs(args.out, exist_ok=True)
    names = sorted(
        f for f in os.listdir(args.images)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    for name in names:
        image = np.asarray(Image.open(os.path.join(args.images, name)).convert("RGB"))
        r = detector.detect([image])[0]
        out_path = os.path.join(args.out, os.path.splitext(name)[0] + ".json")
        # the reference pickles the result dict (amodal_test.py:61-63)
        with open(out_path, "wb") as f:
            pickle.dump(
                {
                    "rois": r["rois"],
                    "class_ids": r["class_ids"],
                    "scores": r["scores"],
                    "masks": r["masks"],
                },
                f,
            )
        log(f"{name}: {len(r['scores'])} detections → {out_path}")


if __name__ == "__main__":
    main()
