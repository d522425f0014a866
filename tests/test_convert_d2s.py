"""Raw-D2S → amodal-COCO JSON conversion (scripts/convert_dataset.py
d2s_to_amodal), the reference's ``D2S TO Amodal COCO.ipynb`` flow:
flat per-object annotations carrying ``occl_depth`` become one annotation
per image with depth-sorted ``regions[]``, loadable by AmodalDataset."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np

from fixtures import rect_mask, rle_str

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "convert_dataset", os.path.join(REPO, "scripts", "convert_dataset.py"))
convert_dataset = importlib.util.module_from_spec(spec)
spec.loader.exec_module(convert_dataset)


def make_raw_d2s(size=32):
    """Flat D2S-style dict: 2 images, 3 + 2 object annotations with
    occl_depth deliberately OUT of order in the list."""
    images = [
        {"id": 10, "file_name": "img_0010.jpg", "width": size, "height": size},
        {"id": 11, "file_name": "img_0011.jpg", "width": size, "height": size},
    ]
    anns = []
    # image 10: depths 2, 0, 1 in list order
    for ann_id, (img_id, depth) in enumerate(
            [(10, 2), (10, 0), (10, 1), (11, 1), (11, 0)]):
        m = rect_mask(size, size, depth, depth, depth + 8, depth + 8)
        anns.append({
            "id": ann_id,
            "image_id": img_id,
            "occl_depth": depth,
            "segmentation": rle_str(m),
            "visible_mask": rle_str(m),
            "area": int(m.sum()),
            "isStuff": 0,
            "occlude_rate": 0.0,
        })
    return {
        "images": images,
        "annotations": anns,
        "categories": [{"id": 1, "name": "foreground"}],
        "info": {"description": "synthetic raw D2S"},
    }


def check_converted(out):
    anns = out["annotations"]
    assert len(anns) == 2
    by_img = {a["image_id"]: a for a in anns}
    assert by_img[10]["size"] == 3 and by_img[11]["size"] == 2
    # regions depth-sorted (frontmost first), region dicts pass through
    assert [r["occl_depth"] for r in by_img[10]["regions"]] == [0, 1, 2]
    assert [r["occl_depth"] for r in by_img[11]["regions"]] == [0, 1]
    assert "segmentation" in by_img[10]["regions"][0]
    # ids are dense 0..N-1; non-annotation keys preserved
    assert sorted(a["id"] for a in anns) == [0, 1]
    assert out["images"] == make_raw_d2s()["images"]
    assert out["categories"][0]["name"] == "foreground"


def test_d2s_to_amodal_dataset():
    check_converted(convert_dataset.d2s_to_amodal_dataset(make_raw_d2s()))


def test_cli_roundtrip_and_dataset_load(tmp_path):
    raw = make_raw_d2s()
    # numpy scalars in the raw file exercise the tolerant encoder path the
    # notebook needed (cell 3 MyEncoder)
    raw["annotations"][0]["image_id"] = np.int64(10)
    raw_path = tmp_path / "D2S_amodal_training_rot0.json"

    class NpEnc(json.JSONEncoder):
        def default(self, o):
            return int(o) if isinstance(o, np.integer) else super().default(o)

    raw_path.write_text(json.dumps(raw, cls=NpEnc))

    out_path = tmp_path / "root" / "annotations" / "D2SA_amodal_val2014.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_dataset.py"),
         "d2s_to_amodal", "--ann", str(raw_path), "--out", str(out_path)],
        check=True, cwd=REPO)
    out = json.loads(out_path.read_text())
    check_converted(out)

    # the converted layout is a loadable D2SA dataset: masks come back per
    # region, depth order preserved
    from PIL import Image

    from sln_amodal_tpu.data.dataset import AmodalDataset

    img_dir = tmp_path / "root" / "val2014"
    img_dir.mkdir(parents=True)
    for info in out["images"]:
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
            img_dir / info["file_name"])
    ds = AmodalDataset()
    ds.load_amodal(str(tmp_path / "root"), "val", data_type="D2SA")
    ds.prepare()
    assert ds.num_images == 2
    amodal, class_ids, _, _ = ds.load_mask(0)
    assert amodal.shape == (32, 32, 3) and list(class_ids) == [1, 1, 1]
