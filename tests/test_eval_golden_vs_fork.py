"""Golden cross-validation: our AmodalEval vs the actual reference fork.

Imports ``/root/reference/evaluate/amodalevalCOCOA.py`` AND
``amodalevalD2SA.py`` (read-only, used as test-time oracles — their only
divergence is the GT order key, ``region['order']`` vs
``region['amodal_region']['order']``, amodalevalD2SA.py:286,302), shims
``pycocotools.mask`` with our own RLE library (the contract is identical —
proven bit-exact vs maskApi.c in test_rle_oracle.py), feeds BOTH evaluators
the same randomized region GT/DT, and asserts identical stats arrays across
the full 12-way {both,things,stuff} x occlusion sweep.

The fork is Python-2/numpy-1.x era; two era shims are applied without
touching the reference tree:
- ``np.linspace`` with a float ``num`` (Params.__init__) → int-cast wrapper;
- ``np.float`` (removed in numpy 1.24) → ``float`` alias during accumulate.

Skipped automatically when the reference tree is absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from sln_amodal_tpu.data.dataset import AmodalCoco, DetectionResults
from sln_amodal_tpu.eval_amodal import rle
from sln_amodal_tpu.eval_amodal.amodal_eval import (
    SWEEP_OCC,
    SWEEP_THINGS,
    AmodalEval,
)

REF_EVALS = {
    "COCOA": "/root/reference/evaluate/amodalevalCOCOA.py",
    "D2SA": "/root/reference/evaluate/amodalevalD2SA.py",
}
ORDER_KEYS = {"COCOA": "order", "D2SA": "amodal_region.order"}

H = W = 40


# ---------------------------------------------------------------- fixtures --

def _blob(rng, h=H, w=W):
    y, x = rng.randint(0, h - 12), rng.randint(0, w - 12)
    hh, ww = rng.randint(6, 13), rng.randint(6, 13)
    m = np.zeros((h, w), np.uint8)
    m[y: y + hh, x: x + ww] = 1
    return m


def _rle_of(mask):
    r = rle.encode(np.asfortranarray(mask))
    return {"size": r["size"], "counts": r["counts"].decode()}


def make_dataset(seed=0, n_images=6, variant="COCOA"):
    """Synthetic region GT + detections with str-counts RLE segmentations.

    ``variant="D2SA"`` nests the GT depth order under
    ``region['amodal_region']['order']`` and removes the flat key, so a
    wrong-key read fails loudly instead of silently matching."""
    rng = np.random.RandomState(seed)
    images, gt_anns, dt_anns = [], [], []
    dt_id = 1
    for img_id in range(1, n_images + 1):
        images.append({"id": img_id, "height": H, "width": W})
        n_regions = rng.randint(3, 7)
        regions = []
        for order in range(1, n_regions + 1):
            m = _blob(rng)
            vis = m.copy()
            # occlude part of the region for nonzero occlude_rate variety
            occ = rng.rand()
            if occ > 0.3:
                cut = int(m.sum() * min(occ, 0.8))
                ys, xs = np.nonzero(vis)
                vis[ys[:cut], xs[:cut]] = 0
            region = {
                "segmentation": _rle_of(m),
                "visible_mask": _rle_of(vis),
                "area": int(m.sum()),
                "isStuff": int(rng.rand() < 0.3),
                "occlude_rate": float(1.0 - vis.sum() / max(m.sum(), 1)),
                "order": order,
            }
            if variant == "D2SA":
                del region["order"]
                region["amodal_region"] = {"order": order}
            regions.append(region)
            # detections: jittered copies of GT masks + one random blob
            if rng.rand() < 0.85:
                d = np.roll(m, rng.randint(-3, 4), axis=rng.randint(0, 2))
                dt_anns.append({
                    "id": dt_id, "image_id": img_id, "category_id": 1,
                    "score": float(rng.rand()),
                    "segmentation": _rle_of(d), "area": int(d.sum()),
                })
                dt_id += 1
        d = _blob(rng)
        dt_anns.append({
            "id": dt_id, "image_id": img_id, "category_id": 1,
            "score": float(rng.rand()),
            "segmentation": _rle_of(d), "area": int(d.sum()),
        })
        dt_id += 1
        gt_anns.append({
            "id": img_id, "image_id": img_id, "category_id": 1,
            "regions": regions,
        })
    return images, gt_anns, dt_anns


# ------------------------------------------------------------- fork driver --

class _ForkGt:
    """Duck-typed amodalGt for the fork evaluator."""

    def __init__(self, images, gt_anns):
        self.imgs = {im["id"]: im for im in images}
        self._anns = {a["id"]: a for a in gt_anns}
        self.dataset = self  # fork reads amodalGt.dataset.loadAnns(...)

    def getImgIds(self):
        return list(self.imgs.keys())

    def getAnnIds(self, imgIds=None):
        ids = set(imgIds) if imgIds is not None else None
        return [a for a, ann in self._anns.items()
                if ids is None or ann["image_id"] in ids]

    def loadAnns(self, ids):
        return [self._anns[i] for i in ids]


class _ForkDt:
    def __init__(self, dt_anns):
        self._anns = {a["id"]: a for a in dt_anns}

    def getAnnIds(self, imgIds=None):
        ids = set(imgIds) if imgIds is not None else None
        return [a for a, ann in self._anns.items()
                if ids is None or ann["image_id"] in ids]

    def loadAnns(self, ids):
        return [self._anns[i] for i in ids]


@pytest.fixture(scope="module", params=["COCOA", "D2SA"])
def fork_variant(request):
    """(variant name, loaded fork module) for each order-key variant."""
    variant = request.param
    ref_path = REF_EVALS[variant]
    if not os.path.exists(ref_path):
        pytest.skip("reference evaluator not available")
    # pycocotools shim backed by our RLE library
    pycocotools = types.ModuleType("pycocotools")
    mask_mod = types.ModuleType("pycocotools.mask")
    for name in ("encode", "decode", "area", "merge", "iou", "frPyObjects",
                 "toBbox", "nms"):
        setattr(mask_mod, name, getattr(rle, name))
    pycocotools.mask = mask_mod
    sys.modules.setdefault("pycocotools", pycocotools)
    sys.modules["pycocotools.mask"] = mask_mod

    spec = importlib.util.spec_from_file_location(
        f"ref_amodaleval_{variant}", ref_path)
    mod = importlib.util.module_from_spec(spec)
    # era shims: numpy>=1.24 removed np.float; linspace num must be int
    np.float = float  # noqa: NPY001
    orig_linspace = np.linspace

    def linspace_intnum(start, stop, num=50, **kw):
        return orig_linspace(start, stop, int(num), **kw)

    np.linspace = linspace_intnum
    try:
        spec.loader.exec_module(mod)
        yield variant, mod
    finally:
        np.linspace = orig_linspace
        del np.float


def run_fork_sweep(mod, images, gt_anns, dt_anns):
    import copy

    stats = {}
    for tname, tval in SWEEP_THINGS.items():
        for oname, orng in SWEEP_OCC.items():
            # explicit limit: the fork's default limit=-1 slices off the
            # last image (imgIds[:limit], amodalevalCOCOA.py:35)
            ev = mod.AmodalEval(
                _ForkGt(copy.deepcopy(images), copy.deepcopy(gt_anns)),
                _ForkDt(copy.deepcopy(dt_anns)),
                limit=len(images),
            )
            ev.params.onlyThings = tval
            ev.params.occRng = orng
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
            stats[f"{tname}/{oname}"] = np.asarray(ev.stats[:6], np.float64)
    return stats


def run_ours_sweep(images, gt_anns, dt_anns, order_key="order"):
    import copy

    gt = AmodalCoco(dataset={
        "images": copy.deepcopy(images),
        "annotations": copy.deepcopy(gt_anns),
    })
    dt = DetectionResults(copy.deepcopy(dt_anns))
    stats = {}
    for tname, tval in SWEEP_THINGS.items():
        for oname, orng in SWEEP_OCC.items():
            ev = AmodalEval(gt, dt, limit=len(images), order_key=order_key)
            ev.params.only_things = tval
            ev.params.occ_rng = orng
            stats[f"{tname}/{oname}"] = ev.run()
    return stats


# -------------------------------------------------------------------- tests --

@pytest.mark.parametrize("seed", [0, 1])
def test_full_sweep_matches_fork(fork_variant, seed):
    variant, fork_module = fork_variant
    images, gt_anns, dt_anns = make_dataset(seed=seed, variant=variant)
    ours = run_ours_sweep(images, gt_anns, dt_anns,
                          order_key=ORDER_KEYS[variant])
    fork = run_fork_sweep(fork_module, images, gt_anns, dt_anns)
    assert set(ours) == set(fork)
    nonzero = 0
    for key in ours:
        np.testing.assert_allclose(
            ours[key], fork[key], rtol=0, atol=1e-12,
            err_msg=f"stats diverge on slice {key}",
        )
        nonzero += int((ours[key] > 0).any())
    # the comparison is vacuous if every slice is empty/zero
    assert nonzero >= 6


def test_match_tables_match_fork(fork_variant):
    """Beyond the summary stats: per-image dtMatches (which record GT depth
    order — read through the variant's order key) must agree with the
    fork's."""
    variant, fork_module = fork_variant
    images, gt_anns, dt_anns = make_dataset(seed=2, variant=variant)
    import copy

    fev = fork_module.AmodalEval(
        _ForkGt(copy.deepcopy(images), copy.deepcopy(gt_anns)),
        _ForkDt(copy.deepcopy(dt_anns)),
        limit=len(images),
    )
    fev.evaluate()

    gt = AmodalCoco(dataset={"images": images, "annotations": gt_anns})
    dt = DetectionResults(dt_anns)
    ours = AmodalEval(gt, dt, order_key=ORDER_KEYS[variant])
    ours.evaluate()

    fork_by_img = {e["image_id"]: e for e in fev.evalImgs if e is not None}
    ours_by_img = {e["image_id"]: e for e in ours.eval_imgs if e is not None}
    assert set(fork_by_img) == set(ours_by_img)
    assert len(ours_by_img) >= 4
    for img_id, fe in fork_by_img.items():
        oe = ours_by_img[img_id]
        np.testing.assert_array_equal(fe["dtMatches"], oe["dt_matches"])
        np.testing.assert_array_equal(fe["gtMatches"], oe["gt_matches"])
        np.testing.assert_array_equal(fe["dtIgnore"], oe["dt_ignore"])
        np.testing.assert_array_equal(fe["gtIgnore"], oe["gt_ignore"])
