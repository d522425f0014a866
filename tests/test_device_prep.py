"""On-device sample preparation vs the host numpy oracle.

``data/device_prep.py`` moves sem-dist decode, bbox extraction, and RPN
anchor matching onto the device; ``data/pipeline.py`` stays as the oracle.
These tests pin (a) the commutation that makes it possible — nearest resize
of the label map == nearest resize of the decoded masks, bit-exact vs
scipy — and (b) full output equivalence of ``prepare_sample`` against
``make_training_sample`` on a real synthetic dataset, up to the random
draws of the anchor-quota subsample (set-level checks there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.data import device_prep, semdist
from sln_amodal_tpu.data.dataset import AmodalDataset
from sln_amodal_tpu.data.device_prep import (
    DevicePrepLoader,
    downsample_label_map,
    encode_sample,
    make_prepare_batch,
    prepare_sample,
)
from sln_amodal_tpu.data.pipeline import (
    TrainLoader,
    build_rpn_targets,
    make_training_sample,
)
from sln_amodal_tpu.ops.anchors import config_anchors
from sln_amodal_tpu.utils import image as image_utils

from fixtures import make_synthetic_dataset


def _random_label_map(rng, h, w, n_objects=5):
    """A realistic sem-dist map: overlapping random rectangles encoded with
    the real encoder (later objects occlude earlier ones)."""
    amodal, invis = [], []
    occupied = np.zeros((h, w), bool)
    for _ in range(n_objects):
        y1, x1 = rng.randint(0, h // 2), rng.randint(0, w // 2)
        y2, x2 = y1 + rng.randint(2, h // 2), x1 + rng.randint(2, w // 2)
        m = np.zeros((h, w), bool)
        m[y1:y2, x1:x2] = True
        amodal.append(m)
        inv = m & occupied
        invis.append(inv if inv.any() else None)
        occupied |= m
    return semdist.encode_layer_map(amodal, invis, min_size=1)


def _device_masks(label_map, size, num_layers):
    """Run the device decode on a host-downsampled map; → [S,S,L,N] bool."""
    n_objects = semdist.max_object_id(semdist.get_image_labels(label_map))
    small = downsample_label_map(label_map, size)
    lo = jnp.asarray((small & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((small >> np.uint64(32)).astype(np.uint32))
    out = device_prep._decode_masks(lo, hi, jnp.int32(n_objects), num_layers)
    # [NOBJ, L, S, S] → [S, S, L, N]
    return np.transpose(np.asarray(out), (2, 3, 1, 0))[..., :n_objects] > 0


@pytest.mark.parametrize("hw", [(37, 53), (100, 80), (64, 64), (19, 91)])
@pytest.mark.parametrize("num_layers", [1, 3])
def test_decode_commutes_with_nearest_resize(hw, num_layers):
    """decode(zoom0(map)) == zoom0(decode(map)) — the device path's small
    map decode equals the oracle's decode-then-scipy-zoom, bit-exact."""
    rng = np.random.RandomState(sum(hw) + num_layers)
    h, w = hw
    size = 48
    label_map = _random_label_map(rng, h, w)

    oracle_masks, _ = semdist.decode_layer_masks(label_map, num_layers)
    scale = (size / h, size / w)
    oracle = image_utils.resize_layer_masks(oracle_masks, scale) > 0

    dev = _device_masks(label_map, size, num_layers)
    assert dev.shape == oracle.shape
    np.testing.assert_array_equal(dev, oracle)


def test_zoom0_indices_match_scipy():
    import scipy.ndimage

    rng = np.random.RandomState(0)
    for (h, w, s) in [(37, 53, 64), (7, 9, 16), (1, 5, 8), (128, 96, 64)]:
        m = rng.randint(0, 7, (h, w, 2, 3)).astype(np.uint8)
        z = scipy.ndimage.zoom(m, zoom=[s / h, s / w, 1, 1], order=0)
        g = m[device_prep.zoom0_indices(h, z.shape[0])][
            :, device_prep.zoom0_indices(w, z.shape[1])]
        np.testing.assert_array_equal(g, z)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("devprep"))
    make_synthetic_dataset(root, n_images=3, size=64, subset="train")
    ds = AmodalDataset()
    ds.load_amodal(root, "train")
    ds.prepare()
    return ds


def _prep_config():
    return Config(image_size=64, name="devprep")


def test_prepare_sample_matches_oracle(synth):
    """Full output equivalence, augment off. Deterministic outputs (image,
    masks, boxes, class ids, positive anchors, deltas) must match exactly;
    the anchor-quota subsample is random on both paths, so negatives are
    checked as (count, subset-of-eligible)."""
    cfg = _prep_config()
    anchors = config_anchors(cfg)

    for image_id in range(3):
        enc = encode_sample(synth, cfg, image_id)
        assert enc is not None
        dev = prepare_sample(
            jnp.asarray(enc["image"]), jnp.asarray(enc["label_lo"]),
            jnp.asarray(enc["label_hi"]), jnp.asarray(enc["n_objects"]),
            jnp.asarray(anchors), jax.random.PRNGKey(image_id),
            config=cfg, augment=False,
        )
        dev = {k: np.asarray(v) for k, v in dev.items()}

        host = make_training_sample(
            synth, cfg, image_id, anchors,
            rng=np.random.default_rng(0), augment=False,
        )

        np.testing.assert_array_equal(dev["images"], host["images"])
        np.testing.assert_array_equal(dev["gt_class_ids"], host["gt_class_ids"])
        np.testing.assert_allclose(dev["gt_boxes"], host["gt_boxes"], atol=1e-6)
        np.testing.assert_array_equal(dev["gt_masks"], host["gt_masks"])
        assert dev["gt_masks"].any(), "vacuous: no mask content"

        # --- RPN: positives are deterministic when under the half-quota ---
        pos_dev = np.where(dev["rpn_match"] == 1)[0]
        pos_host = np.where(host["rpn_match"] == 1)[0]
        assert pos_dev.size <= cfg.rpn_train_anchors_per_image // 2
        np.testing.assert_array_equal(pos_dev, pos_host)
        assert pos_dev.size > 0
        np.testing.assert_allclose(
            dev["rpn_deltas"][pos_dev], host["rpn_deltas"][pos_dev],
            atol=2e-5,
        )
        np.testing.assert_array_equal(
            dev["rpn_deltas"][dev["rpn_match"] != 1], 0.0)

        # --- negatives: right count, drawn from the eligible set ----------
        no_subsample = cfg.replace(rpn_train_anchors_per_image=10 ** 6)
        full_match, _ = build_rpn_targets(
            anchors,
            np.asarray([1] * int(enc["n_objects"]), np.int32),
            # boxes as the oracle computed them (augment off → no jitter)
            (host["gt_boxes"][: int(enc["n_objects"])] * cfg.image_size),
            no_subsample, rng=np.random.default_rng(1),
        )
        eligible_neg = set(np.where(full_match == -1)[0])
        neg_dev = np.where(dev["rpn_match"] == -1)[0]
        quota = cfg.rpn_train_anchors_per_image - pos_dev.size
        assert neg_dev.size == min(quota, len(eligible_neg))
        assert set(neg_dev) <= eligible_neg


def test_prepare_sample_no_objects():
    cfg = _prep_config()
    s = cfg.image_size
    anchors = config_anchors(cfg)
    dev = prepare_sample(
        jnp.zeros((s, s, 3), jnp.uint8), jnp.zeros((s, s), jnp.uint32),
        jnp.zeros((s, s), jnp.uint32), jnp.int32(0),
        jnp.asarray(anchors), jax.random.PRNGKey(0),
        config=cfg, augment=False,
    )
    # the oracle marks every anchor negative and samples nothing
    assert (np.asarray(dev["rpn_match"]) == -1).all()
    assert (np.asarray(dev["rpn_deltas"]) == 0).all()
    assert (np.asarray(dev["gt_class_ids"]) == 0).all()
    assert (np.asarray(dev["gt_masks"]) == 0).all()


def test_prepare_sample_augment_flip_is_exact(synth):
    """With augment on, the output image must be either the molded original
    or its exact horizontal flip, and gt_masks must follow the same flip."""
    cfg = _prep_config()
    anchors = config_anchors(cfg)
    enc = encode_sample(synth, cfg, 0)
    base = make_training_sample(
        synth, cfg, 0, anchors, rng=np.random.default_rng(0), augment=False)

    flipped_seen = unflipped_seen = False
    for seed in range(6):
        dev = prepare_sample(
            jnp.asarray(enc["image"]), jnp.asarray(enc["label_lo"]),
            jnp.asarray(enc["label_hi"]), jnp.asarray(enc["n_objects"]),
            jnp.asarray(anchors), jax.random.PRNGKey(seed),
            config=cfg, augment=True,
        )
        img = np.asarray(dev["images"])
        masks = np.asarray(dev["gt_masks"])
        if np.array_equal(img, base["images"]):
            unflipped_seen = True
            np.testing.assert_array_equal(masks, base["gt_masks"])
        elif np.array_equal(img, base["images"][:, ::-1]):
            flipped_seen = True
            np.testing.assert_array_equal(masks, base["gt_masks"][..., ::-1])
        else:
            raise AssertionError("augmented image is neither original nor flip")
        # jittered boxes stay in frame and normalized
        boxes = np.asarray(dev["gt_boxes"])
        assert (boxes >= 0).all() and (boxes <= 1.0).all()
    assert flipped_seen and unflipped_seen, "flip coin never landed both ways"


def test_prepare_batch_sharded_matches_single(synth):
    """SPMD data prep: on a 2-device mesh the prepared batch is sharded
    batch-first AND numerically identical to the single-device program —
    samples are independent, so sharding must not change any output."""
    from sln_amodal_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    cfg = _prep_config().replace(batch_size=2)
    mesh = make_mesh(jax.devices()[:2])

    sharded = DevicePrepLoader(synth, cfg, seed=0, augment=False, workers=1,
                               mesh=mesh)
    single = DevicePrepLoader(synth, cfg, seed=0, augment=False, workers=1)
    b_sh = next(iter(sharded))
    b_1 = next(iter(single))

    assert len(b_sh["images"].sharding.device_set) == 2
    # batch dim split across the mesh (shard shape = [1, ...])
    shard_shapes = {s.data.shape[0] for s in b_sh["images"].addressable_shards}
    assert shard_shapes == {1}
    for k in b_1:
        np.testing.assert_array_equal(
            np.asarray(b_sh[k]), np.asarray(b_1[k]), err_msg=k)


def test_rle_roundtrip_matches_dense():
    """rle_encode_map → runs_to_planes reproduces the dense uint32 planes
    bit-exactly, including single-run and worst-case (every pixel distinct)
    maps; over-budget maps signal via n_runs > budget."""
    rng = np.random.RandomState(7)
    size = 48
    maps = [
        _random_label_map(rng, 80, 64),            # realistic
        np.zeros((size, size), np.uint64),          # single run
        (np.arange(size * size, dtype=np.uint64)    # every pixel distinct
         .reshape(size, size) << np.uint64(20)),
    ]
    for label_map in maps:
        small = downsample_label_map(label_map, size)
        budget = size * size  # always enough
        starts, lo, hi, n_runs = device_prep.rle_encode_map(small, budget)
        assert int(n_runs) <= budget
        got_lo, got_hi = device_prep.runs_to_planes(
            jnp.asarray(starts), jnp.asarray(lo), jnp.asarray(hi), size)
        np.testing.assert_array_equal(
            np.asarray(got_lo), (small & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(got_hi), (small >> np.uint64(32)).astype(np.uint32))

    # over-budget: n_runs reports the TRUE count so the loader can fall back
    small = downsample_label_map(maps[2], size)
    starts, lo, hi, n_runs = device_prep.rle_encode_map(small, 16)
    assert int(n_runs) == size * size and starts.shape == (16,)


def test_loader_rle_and_dense_paths_agree(synth):
    """The loader's RLE upload path and the dense fallback path (forced by a
    tiny budget) must produce identical prepared batches — same seed, same
    samples, same random keys."""
    cfg = _prep_config().replace(batch_size=2)
    rle_loader = DevicePrepLoader(synth, cfg, seed=3, augment=False, workers=1)
    assert rle_loader._rle_budget > 0
    dense_loader = DevicePrepLoader(synth, cfg, seed=3, augment=False, workers=1)
    dense_loader._rle_budget = 0  # every batch overflows → dense fallback

    b_rle = next(iter(rle_loader))
    b_dense = next(iter(dense_loader))
    assert True in rle_loader._prepare_cache
    assert False in dense_loader._prepare_cache
    for k in b_dense:
        np.testing.assert_array_equal(
            np.asarray(b_rle[k]), np.asarray(b_dense[k]), err_msg=k)


def test_device_prep_loader_batches(synth):
    cfg = _prep_config().replace(batch_size=2)
    loader = DevicePrepLoader(synth, cfg, seed=0, augment=True, workers=1)
    batch = next(iter(loader))
    s, g, a = cfg.image_size, cfg.max_gt_instances, cfg.num_anchors
    assert batch["images"].shape == (2, s, s, 3)
    assert batch["rpn_match"].shape == (2, a)
    assert batch["rpn_deltas"].shape == (2, a, 4)
    assert batch["gt_class_ids"].shape == (2, g)
    assert batch["gt_boxes"].shape == (2, g, 4)
    assert batch["gt_masks"].shape == (2, g, cfg.num_layers, s, s)
    assert np.isfinite(np.asarray(batch["images"])).all()
    assert np.isfinite(np.asarray(batch["rpn_deltas"])).all()
    assert np.asarray(batch["gt_class_ids"]).sum() > 0
    # both quota bounds hold on every sample
    m = np.asarray(batch["rpn_match"])
    assert ((m == 1).sum(axis=1) <= cfg.rpn_train_anchors_per_image // 2).all()
    assert ((m != 0).sum(axis=1) <= cfg.rpn_train_anchors_per_image).all()


def test_device_prefetch_exhaustion_and_error(synth):
    """The device-prefetch wrapper must terminate when the inner stream
    exhausts (sentinel on normal completion — not hang on q.get) and must
    re-raise an inner-stream failure on the consumer side."""
    cfg = _prep_config().replace(batch_size=1)
    loader = DevicePrepLoader(synth, cfg, seed=0, augment=False, workers=1)

    finite = [{"x": i} for i in range(3)]
    loader._dispatch_stream = lambda: iter(finite)
    assert list(iter(loader)) == finite

    def failing():
        yield {"x": 0}
        raise RuntimeError("inner stream died")

    loader._dispatch_stream = failing
    it = iter(loader)
    assert next(it) == {"x": 0}
    with pytest.raises(RuntimeError, match="inner stream died"):
        next(it)

    # early consumer break must not leak a stuck dispatcher thread
    loader._dispatch_stream = lambda: iter(finite * 100)
    it = iter(loader)
    next(it)
    it.close()


def test_device_prep_loader_rejects_legacy_dataset(synth, tmp_path, monkeypatch):
    """A dataset without .npz sem-dist maps (legacy .layer pickles) must be
    rejected at construction with an actionable error, not skip-and-spin in
    the worker loop."""
    import os

    cfg = _prep_config()
    real = synth.image_info[int(synth.image_ids[0])]["path"]
    missing = str(tmp_path / os.path.basename(real))
    # point the first image at a location with no sibling .npz
    import shutil
    shutil.copy(real, missing)
    monkeypatch.setitem(
        synth.image_info[int(synth.image_ids[0])], "path", missing)
    with pytest.raises(ValueError, match="device_prep"):
        DevicePrepLoader(synth, cfg, seed=0, workers=1)


def test_overflow_skips_counted_separately(synth, capsys):
    """A sample whose RLE run count exceeds the static budget on a multi-host
    run is dropped via SampleOverflowError — counted apart from corrupt-data
    errors, with a loud warning once the drop rate is systematic (ADVICE r4:
    silent filtering would bias training invisibly)."""
    from sln_amodal_tpu.data.pipeline import SampleOverflowError

    cfg = _prep_config().replace(batch_size=1)
    loader = DevicePrepLoader(synth, cfg, seed=0, augment=False, workers=1)
    loader._multi = True   # pretend multi-host: dense fallback forbidden
    loader._rle_budget = 0  # every sample overflows

    with pytest.raises(SampleOverflowError, match="RLE runs"):
        loader._make_one_sample(int(synth.image_ids[0]), loader.rng)

    # the containment loop counts overflow on its own counter and warns
    # when the rate is systematic (alternate per CALL so the assertion is
    # independent of the stream's shuffle order)
    calls = [0]

    def alternating(image_id, rng):
        calls[0] += 1
        if calls[0] % 2 == 1:
            raise SampleOverflowError(f"sample {image_id} needs RLE runs")
        return {"ok": calls[0]}

    loader._make_one_sample = alternating
    stream = loader._sample_stream()
    got = [next(stream) for _ in range(8)]
    assert [g["ok"] for g in got] == [2, 4, 6, 8, 10, 12, 14, 16]
    assert loader.overflow_count == 8
    assert loader.error_count == 0
    out = capsys.readouterr().out
    assert "overflow_skips=" in out
    assert "systematically filtered" in out
