"""Synthetic COCOA-style dataset builder for tests and e2e verification."""

import json
import os

import numpy as np
from PIL import Image

from sln_amodal_tpu.data import semdist
from sln_amodal_tpu.eval_amodal import rle


def rect_mask(h, w, y1, x1, y2, x2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x2] = True
    return m


def rle_str(mask):
    r = rle.encode(np.asfortranarray(mask.astype(np.uint8)))
    return {"size": r["size"], "counts": r["counts"].decode()}


def make_synthetic_dataset(root, n_images=4, size=64, data_type="COCO",
                           subset="train", year="2014", seed=0):
    """Images + sibling .npz sem-dist maps + amodal annotation JSON.

    Each image has two overlapping rectangles; object 0 is occluded by
    object 1.
    """
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, f"{subset if subset not in ('minival','valminusminival') else 'val'}{year}")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    for i in range(n_images):
        img_id = i + 1
        fname = f"img_{img_id:04d}.jpg"
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, fname))

        o = rng.randint(0, size // 4)
        half = size // 2
        a0 = rect_mask(size, size, o, o, o + half, o + half)
        a1 = rect_mask(size, size, o + half // 2, o + half // 2,
                       o + half // 2 + half, o + half // 2 + half)
        inv0 = a0 & a1
        label = semdist.encode_layer_map([a0, a1], [inv0, None], min_size=4)
        np.savez(os.path.join(img_dir, fname[:-4] + ".npz"), layer=label)

        occl = float(inv0.sum()) / max(float(a0.sum()), 1.0)
        regions = [
            {
                "segmentation": rle_str(a0),
                "visible_mask": rle_str(a0 & ~inv0),
                "invisible_mask": rle_str(inv0),
                "isStuff": 0,
                "occlude_rate": occl,
                "order": 1,
                "amodal_region": {"order": 1},
                "area": int(a0.sum()),
            },
            {
                "segmentation": rle_str(a1),
                "visible_mask": rle_str(a1),
                "isStuff": 0,
                "occlude_rate": 0.0,
                "order": 2,
                "amodal_region": {"order": 2},
                "area": int(a1.sum()),
            },
        ]
        images.append({"id": img_id, "file_name": fname, "width": size, "height": size})
        annotations.append({"id": img_id, "image_id": img_id, "regions": regions})

    dataset = {"images": images, "annotations": annotations}
    path = os.path.join(ann_dir, f"{data_type}_amodal_{subset}{year}.json")
    with open(path, "w") as f:
        json.dump(dataset, f)
    return root
