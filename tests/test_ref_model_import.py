"""Parity against the reference's REAL torch modules (not a replica).

Round-3 VERDICT item 4: the full-graph parity test's torch side is a
hand-built replica of ``model.py:516-620`` — a transcription error there
would be invisible. These tests import the reference's own ``model.py`` /
``modal/modals.py`` / ``modal/deeplabv2.py`` (via tests/ref_import.py era
shims), construct the REAL ``MaskRCNN`` + the live head surgery
(``amodal_train.py:574-614``), and pin:

1. the weight converter consumes EVERY key of the real post-surgery
   state_dict (nothing silently dropped) and fills every slot of our tree;
2. our ``torch_export`` emits exactly the real layout (key-for-key);
3. the REAL ``predict()`` forward at 128² float64 matches our jitted
   inference graph loaded from the converted state_dict — stage taps
   captured with forward hooks (zero re-composition of the reference
   graph), through detections and mask logits.

The GLM input is 513² hardcoded in ``model.py:535``; the forward test
rewrites exactly that upsample size to the test grid (65²) on both sides —
``MSC``/DeepLab are size-generic, so the comparison stays faithful.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ref_import  # noqa: E402
from sln_amodal_tpu.config import Config  # noqa: E402
from sln_amodal_tpu.convert import torch_weights as cv  # noqa: E402
from sln_amodal_tpu.convert import torch_export as ex  # noqa: E402
from sln_amodal_tpu.models.sln import SLNAmodal, init_params  # noqa: E402

pytestmark = pytest.mark.slow

if not ref_import.reference_available():
    pytest.skip("reference tree not present", allow_module_level=True)

IMG = 128
GLM_IN = 65


def our_config():
    # mirrors the REAL inference config exactly: the reference hardcodes
    # pre_nms = min(6000, anchors) (Functions.py:145) and we must match its
    # effective value at 128² (4092 anchors). The box-delta std devs go
    # through f32 rounding because the reference materializes them as f32
    # constants (Functions.py:137 ``.float()``) even when the tensors are
    # f64 — without this, ONE proposal coordinate in 200 differs at 4e-9.
    std = tuple(float(np.float32(v)) for v in (0.1, 0.1, 0.2, 0.2))
    return Config(
        image_size=IMG,
        glm_input_size=GLM_IN,
        pre_nms_limit=6000,
        post_nms_rois_inference=50,
        # the reference's USE_NMS=False path caps at a HARDCODED 100
        # (Functions.py:531; its DETECTION_MAX_INSTANCES is assigned to a
        # dead variable at :548) — our knob IS the effective cap, so parity
        # requires 100 here, not an arbitrary small table
        detection_max_instances=100,
        max_gt_instances=8,
        rpn_bbox_std_dev=std,
        bbox_std_dev=std,
        compute_dtype="float64",
        param_dtype="float64",
    )


@pytest.fixture(scope="module")
def real(tmp_path_factory):
    m, cfg = ref_import.build_real_maskrcnn(
        IMG, str(tmp_path_factory.mktemp("ref")), num_classes=2, seed=0,
        dtype=torch.float64)
    # the surgery's fresh layers are f32-initialized before .to(f64); make
    # their values reproducible too
    return m, cfg


def _real_state_dict(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


class _Recording(dict):
    """Dict recording which keys the converter actually reads."""

    def __init__(self, d):
        super().__init__(d)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def test_convert_consumes_every_real_key(real):
    """convert_full_checkpoint must read every key the REAL post-surgery
    model carries (except torch's bookkeeping ``num_batches_tracked``) and
    produce a tree that matches our init slot-for-slot — if the reference
    graph carried a module our converter ignores, this fails."""
    m, _ = real
    sd = _Recording(_real_state_dict(m))
    tree = cv.convert_full_checkpoint(sd)
    init = init_params(our_config(), jax.random.PRNGKey(0))
    cv.assert_tree_matches(tree, init)
    unread = {k for k in sd
              if k not in sd.read and not k.endswith("num_batches_tracked")}
    assert not unread, f"converter ignored real keys: {sorted(unread)[:10]}"


def test_torch_export_emits_real_layout(real):
    """export_state_dict must emit exactly the REAL model's key set (minus
    ``num_batches_tracked``), with matching shapes — so checkpoints we
    export load into the reference with strict=True semantics."""
    m, _ = real
    real_sd = {k: v for k, v in _real_state_dict(m).items()
               if not k.endswith("num_batches_tracked")}
    ours = ex.export_state_dict(init_params(our_config(),
                                            jax.random.PRNGKey(0)))
    missing = set(real_sd) - set(ours)
    extra = set(ours) - set(real_sd)
    assert not missing and not extra, (
        f"missing={sorted(missing)[:8]} extra={sorted(extra)[:8]}")
    for k, v in real_sd.items():
        assert tuple(ours[k].shape) == tuple(v.shape), (
            k, ours[k].shape, v.shape)


# ----------------------------------------------------------- forward parity


class _glm_at_test_grid:
    """Context manager rewriting the hardcoded 513² GLM upsample
    (model.py:535) to the test grid; everything else untouched."""

    def __enter__(self):
        import torch.nn.functional as F

        self._orig = F.upsample

        def patched(x, size=None, **kw):
            if size == (513, 513):
                size = (GLM_IN, GLM_IN)
            return self._orig(x, size=size, **kw)

        F.upsample = patched
        return self

    def __exit__(self, *exc):
        import torch.nn.functional as F

        F.upsample = self._orig
        return False


def test_real_predict_matches_our_graph(real):
    """The REAL composed predict() vs our jitted inference graph, from the
    same (converted) weights, float64 both sides at 128².

    Stage taps come from forward hooks on the real modules — fpn maps, the
    classifier's proposal input, the mask head's detection-box input — so
    nothing about the reference composition is re-transcribed here. Then
    final detections (exact discrete fields) and mask logits compare."""
    m, _refcfg = real
    cfg = our_config()

    # ---- identical input: molded f64 image, full-image window ----
    rng = np.random.RandomState(42)
    img = rng.uniform(-120.0, 130.0, size=(IMG, IMG, 3)).astype(np.float64)
    t_img = torch.from_numpy(img.transpose(2, 0, 1)[None])  # NCHW f64
    mods = ref_import.load_reference_modules()
    meta = mods["Functions"].compose_image_meta(
        0, (IMG, IMG, 3), (0, 0, IMG, IMG), np.zeros(2, np.int32))
    metas = torch.from_numpy(np.asarray(meta, np.float32)[None])

    taps = {}

    def grab(name, take=None):
        def hook(_mod, args, out):
            taps.setdefault(name, []).append(
                (args, out))
        return hook

    hooks = [
        m.fpn.register_forward_hook(grab("fpn")),
        m.classifier.register_forward_hook(grab("classifier")),
        m.mask.register_forward_hook(grab("mask")),
    ]
    try:
        with torch.no_grad(), _glm_at_test_grid():
            detections_t, masks_t = m.predict([t_img, metas], mode="inference")
    finally:
        for h in hooks:
            h.remove()

    detections_t = detections_t.squeeze(0).numpy()     # [N, 6] pixel coords
    masks_t = masks_t.squeeze(0).numpy()               # [N, C, 2m, 2m]
    assert detections_t.shape[0] > 0

    # ---- ours, from the converted REAL weights (x64 so float noise
    # cannot flip discrete selections — same rationale as
    # test_parity_full_graph) ----
    with jax.enable_x64(True):
        variables = cv.convert_full_checkpoint(_real_state_dict(m))
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float64), variables)
        model = SLNAmodal(cfg)
        images = jnp.asarray(img[None])
        windows = jnp.asarray(
            [[0.0, 0.0, float(IMG), float(IMG)]], jnp.float64)

        def tap(mm, x):
            p2, p3, p4, p5, p6 = mm.fpn(x)
            _, probs, deltas = mm._rpn_all_levels((p2, p3, p4, p5, p6))
            rois, roi_valid = mm._proposals(
                probs, deltas, cfg.post_nms_rois_inference)
            return {"p2": p2, "p5": p5, "p6": p6, "rois": rois,
                    "roi_valid": roi_valid}

        ours_taps = model.apply(variables, images, method=tap)
        out = model.apply(variables, images, windows,
                          method=SLNAmodal.infer)

    # ---- stage: FPN maps (NCHW vs NHWC) ----
    fpn_out = taps["fpn"][0][1]                         # [p2..p6] NCHW
    for name, theirs in (("p2", fpn_out[0]), ("p5", fpn_out[3]),
                         ("p6", fpn_out[4])):
        np.testing.assert_allclose(
            np.asarray(ours_taps[name][0]),
            theirs.squeeze(0).numpy().transpose(1, 2, 0),
            rtol=1e-9, atol=1e-9, err_msg=name)

    # ---- stage: proposals (the classifier hook's rpn_rois input) ----
    rois_t = taps["classifier"][0][0][1].squeeze(0).numpy()  # [R, 4] norm
    n_valid = int(np.asarray(ours_taps["roi_valid"][0]).sum())
    rois_ours = np.asarray(ours_taps["rois"][0])[:n_valid]
    assert rois_t.shape[0] == n_valid, (rois_t.shape, n_valid)
    # identical keep COUNT and SET to float noise: the deep f64 conv stacks
    # differ at ~1e-10 between XLA and torch, which the delta/exp box math
    # amplifies to a few 1e-9 on isolated coordinates — real drift would be
    # orders of magnitude above 1e-7
    np.testing.assert_allclose(rois_ours, rois_t, rtol=1e-5, atol=1e-7)

    # ---- final: detections ----
    det_ours = np.asarray(out.detections[0])
    n_det = int(np.asarray(out.det_valid[0]).sum())
    det_ours = det_ours[:n_det]
    assert detections_t.shape[0] == n_det, (detections_t.shape, n_det)
    # class ids exactly; scores/boxes to float tolerance
    np.testing.assert_array_equal(
        det_ours[:, 4].astype(np.int64), detections_t[:, 4].astype(np.int64))
    np.testing.assert_allclose(det_ours[:, 5], detections_t[:, 5],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(det_ours[:, :4], detections_t[:, :4],
                               rtol=1e-5, atol=1e-6)

    # ---- final: mask logits (channel 1 already sigmoid-summed both sides,
    # model.py:618); theirs [N, C, 2m, 2m] vs ours [D, 2m, 2m, C] ----
    masks_ours = np.asarray(out.masks[0])[:n_det]
    np.testing.assert_allclose(
        masks_ours, masks_t.transpose(0, 2, 3, 1),
        rtol=1e-4, atol=5e-4)
