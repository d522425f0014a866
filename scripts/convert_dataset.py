#!/usr/bin/env python
"""Dataset conversion tools (replaces the reference's conversion notebooks,
``/root/reference/scripts/*.ipynb``):

- ``encode``: COCOA/D2SA amodal annotation JSON → per-image uint64 sem-dist
  ``.npz`` maps next to each image (the ``reLayerMask`` encoder flow);
- ``check``: decode a sample of ``.npz`` maps back and report consistency
  against the annotation masks (the notebooks' "check file" cells).

Usage:
    python scripts/convert_dataset.py encode --dataset /path/root \
        --subset train --data_type COCO
    python scripts/convert_dataset.py check --dataset /path/root --subset val
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sln_amodal_tpu.data import semdist  # noqa: E402
from sln_amodal_tpu.data.dataset import AmodalDataset  # noqa: E402


def encode(args) -> None:
    ds = AmodalDataset()
    ds.load_amodal(args.dataset, args.subset, data_type=args.data_type, year=args.year)
    ds.prepare()
    for image_id in range(ds.num_images):
        info = ds.image_info[image_id]
        amodal, class_ids, _vis, invis = ds.load_mask(image_id)
        n = amodal.shape[-1]
        label = semdist.encode_layer_map(
            [amodal[:, :, i] for i in range(n)],
            [invis[:, :, i] if invis[:, :, i].any() else None for i in range(n)],
            min_size=args.min_size,
        )
        out = info["path"][:-4] + ".npz"
        np.savez_compressed(out, layer=label)
        print(f"[{image_id + 1}/{ds.num_images}] {out} ({n} objects)")


def check(args) -> None:
    ds = AmodalDataset()
    ds.load_amodal(args.dataset, args.subset, data_type=args.data_type, year=args.year)
    ds.prepare()
    n_check = min(args.limit, ds.num_images) if args.limit > 0 else ds.num_images
    bad = 0
    for image_id in range(n_check):
        info = ds.image_info[image_id]
        path = info["path"][:-4] + ".npz"
        if not os.path.exists(path):
            print(f"MISSING {path}")
            bad += 1
            continue
        label = semdist.load_layer_file(path)
        amodal, class_ids, _, _ = semdist.decode_instance_masks(label)
        ann_amodal, ann_ids, _, _ = ds.load_mask(image_id)
        n_dec, n_ann = amodal.shape[-1], ann_amodal.shape[-1]
        status = "ok"
        if n_dec != min(n_ann, 32):
            status = f"OBJECT-COUNT {n_dec} vs {n_ann}"
            bad += 1
        print(f"[{image_id + 1}/{n_check}] {os.path.basename(path)}: "
              f"{n_dec} decoded / {n_ann} annotated — {status}")
    print(f"checked {n_check}, problems: {bad}")
    if bad:
        sys.exit(1)


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("encode", encode), ("check", check)):
        sp = sub.add_parser(name)
        sp.add_argument("--dataset", required=True)
        sp.add_argument("--subset", default="train")
        sp.add_argument("--data_type", default="COCO")
        sp.add_argument("--year", default="2014")
        sp.add_argument("--min_size", type=int, default=64)
        sp.add_argument("--limit", type=int, default=-1)
        sp.set_defaults(fn=fn)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
