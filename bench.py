#!/usr/bin/env python
"""End-to-end benchmarks on real TPU hardware.

Emits one JSON line per metric; the HEADLINE metric (full-parity batch-1
inference images/sec at 1024², GLM on) is printed LAST so tail-parsers pick
it up.

Metrics:
- ``train_step_ms_b1`` / ``train_step_ms_b8``: the HEADS-stage jitted
  training step (forward + 6 losses + grads for the stage's trainable set
  + clip + SGD) at 1024², batch 1 / 8 — the reference recipe's first stage
  (``amodal_train.py:636-641``). The frozen backbone's backward is elided
  via stop_gradient, matching the reference's ``requires_grad=False``.
- ``train_step_all_ms_b8``: the same step at stage "all" — full backward
  through every layer plus the all-tensor optimizer update (the directly
  comparable successor of the round-2 ``train_step_ms_b8``, which computed
  the full backward with the heads-stage optimizer).
- ``inference_noglm_images_per_sec_1024``: the ``detect()`` contract with
  ``glm_elide_at_inference``: the frozen DeepLab forward skipped because the
  reference's pixel-coords quirk (``model.py:591``) zeroes its contribution
  for every interior box (see config.py — NEAR-parity fast mode: masks of
  detections touching the top/left image edge can differ).
- ``inference_batch8_images_per_sec_1024``: full graph (GLM on), batch 8.
- ``eval_pipeline_images_per_sec_1024``: TRUE end-to-end eval throughput —
  the CLI's pipelined dispatch/collect loop with host unmold + RLE encode
  of a full detection table per image, wall-clock (the BASELINE north-star
  operational metric; batch 8, full-parity graph).
- ``train_pipeline_ms_b8``: wall-clock ms/step of the real training
  pipeline (DevicePrepLoader with on-device target construction feeding
  the jitted step) on synthetic 1024² data — the data-inclusive companion
  to ``train_step_ms_b8``.
- ``nms_kernel_ms_6000`` / ``aspp_kernel_ms_65sq``: the two custom-kernel
  hot ops at their production shapes (vs_baseline = speedup over the exact
  XLA-lowered alternative measured on the same chip).
- ``train_step_mfu_b8`` / ``inference_mfu_b1``: model FLOPs utilization —
  HLO cost-analysis FLOPs of the program divided by measured time, over the
  197 TFLOP/s bf16 peak of one v5e chip. Best-effort: if the platform can't
  produce a cost analysis the MFU record carries an ``error`` field and the
  companion timing metric is unaffected.
- ``inference_images_per_sec_1024``: full graph (GLM on: DeepLab-MSC @513,
  scales 1/0.5/0.75), batch 1 — comparable across rounds. HEADLINE.

Every metric runs under ``run_metric``: bounded retries (3 attempts with
backoff) against transport flakes, and an explicit
``{"metric": ..., "error": ...}`` JSON record on final failure — a missing
number is visible, never silently absent.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` uses our
documented estimates for the PyTorch-0.4 single-GPU (8 GB, 2019-era)
reference: 2.0 images/s inference, 1000 ms/step training at batch 1.

Methodology: each metric compiles ONE program that runs the step N times in
a ``lax.fori_loop`` with the next iteration's input data-dependent on the
previous output, and fetches a scalar at the end. The loop's trip count is
a runtime argument and each metric is timed at N and 2N trips — the
difference eliminates the constant ~25 ms per-call transport latency of
this tunneled platform, which a single-point T(N)/N would smear as +25/N ms
per iteration (rounds 1-2 carried that bias: ~-4%% on the batch-1 headline,
~-40%% on the NMS kernel number). See ``utils/benchmark.py``. Production
serving pipelines batches/steps without a host round-trip per image, which
the in-graph loop models.
"""

import gc
import json
import sys
import time
import traceback

REFERENCE_IMAGES_PER_SEC = 2.0   # estimated reference inference throughput
REFERENCE_TRAIN_STEP_MS = 1000.0  # estimated reference train step, batch 1
PEAK_BF16_FLOPS = 197e12  # TPU v5e ("TPU v5 lite") MXU peak, bf16


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }), flush=True)


def run_metric(name, fn, retries=3):
    """Run one metric with bounded retries against transport flakes.

    The round-3 bench lost its most important number to a single
    ``JaxRuntimeError: remote_compile ... body closed`` swallowed by a bare
    except. Now: retry up to ``retries`` times with backoff, and on final
    failure emit an explicit ``{"metric": ..., "error": ...}`` record so a
    missing value is visible in the JSON instead of silently absent.
    Returns the metric value, or None after final failure.

    Keeps only the exception's ``repr`` — holding the exception object
    would pin its traceback frames and every device array they reference
    (states, batches), which is exactly how one failed metric cascaded
    into RESOURCE_EXHAUSTED for every later metric in the round-4 dry
    run. The ``gc.collect()`` below runs after the handler exits (the
    interpreter has dropped the traceback by then) so the freed HBM is
    actually returned before the retry re-allocates."""
    last = None
    for attempt in range(retries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — must survive infra flakes
            last = repr(e)[:300]
            traceback.print_exc(file=sys.stderr)
            print(f"[bench] {name}: attempt {attempt + 1}/{retries} "
                  f"failed: {last}", file=sys.stderr, flush=True)
        gc.collect()
        time.sleep(2.0 * (attempt + 1))
    print(json.dumps({"metric": name, "error": last}), flush=True)
    return None


def program_flops(fn, *args):
    """HLO cost-analysis FLOPs of ``jit(fn)(*args)``, or None if the
    platform can't provide them (the MFU metric is then skipped — the
    timing metric must never die with it).

    ``Lowered.cost_analysis()`` is pure client-side (no device compile)
    and works on CPU, but returns None on the tunneled axon TPU platform;
    there we fall back to ``Compiled.cost_analysis()``, which costs one
    remote compile of the bare program (persistently cached across runs)."""
    import jax

    try:
        lowered = jax.jit(fn).lower(*args)
        ca = lowered.cost_analysis()
        if ca is None:
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca or "flops" not in ca:
            return None
        return float(ca["flops"])
    except Exception:  # noqa: BLE001 — MFU is best-effort, timing is not
        traceback.print_exc(file=sys.stderr)
        return None


def _rand_images(batch, size, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    # molded-image statistics: mean-subtracted uint8-ish range
    return rng.uniform(-120.0, 130.0, size=(batch, size, size, 3)).astype("float32")


def bench_inference(config, variables, batch, method_name, iters=20,
                    with_flops=False):
    import jax.numpy as jnp

    from sln_amodal_tpu.models.sln import SLNAmodal
    from sln_amodal_tpu.utils.benchmark import loop_time

    model = SLNAmodal(config)
    method = getattr(SLNAmodal, method_name)
    s = config.image_size
    images = jnp.asarray(_rand_images(batch, s))
    windows = jnp.tile(
        jnp.asarray([[0.0, 0.0, float(s), float(s)]], jnp.float32), (batch, 1)
    )
    fn = lambda x, v: model.apply(v, x, windows, method=method)  # noqa: E731
    dt = loop_time(fn, images, (variables,), iters=iters)
    if with_flops:
        flops = program_flops(fn, images, variables)
        return batch / dt, (flops / dt if flops else None)
    return batch / dt


def bench_train_step(config, variables, batch, iters=8, stage="heads",
                     with_flops=False):
    """Jitted train step at the given stage (see module docstring): the
    stage picks both the optimizer's trainable set and — via the
    stop_gradient freeze in ``make_train_step`` — how deep the backward
    runs ("heads" skips the whole ResNet-FPN backward, like the reference's
    ``requires_grad=False`` stage 1; "all" is the full backward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from sln_amodal_tpu.models.sln import SLNAmodal
    from sln_amodal_tpu.train.optim import make_optimizer, trainable_mask
    from sln_amodal_tpu.train.trainer import TrainState, make_train_step

    cfg = config.replace(batch_size=batch)
    model = SLNAmodal(cfg)
    tx = make_optimizer(variables, stage, cfg.learning_rate)
    state = TrainState(variables, tx.init(variables), jnp.zeros((), jnp.int32))

    s, g, l = cfg.image_size, cfg.max_gt_instances, cfg.num_layers
    rng = np.random.RandomState(0)
    masks = np.zeros((batch, g, l, s, s), np.float32)
    masks[:, 0, 0, s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 1.0
    batch_data = {
        "images": jnp.asarray(_rand_images(batch, s, seed=1)),
        "rpn_match": jnp.asarray(
            np.concatenate(
                [np.ones((batch, 32), np.int32),
                 -np.ones((batch, 32), np.int32),
                 np.zeros((batch, cfg.num_anchors - 64), np.int32)], axis=1)),
        "rpn_deltas": jnp.asarray(
            rng.randn(batch, cfg.num_anchors, 4).astype(np.float32) * 0.1),
        "gt_class_ids": jnp.asarray(
            np.tile(np.array([[1] + [0] * (g - 1)], np.int32), (batch, 1))),
        "gt_boxes": jnp.asarray(np.tile(
            np.array([[[0.25, 0.25, 0.75, 0.75]] + [[0] * 4] * (g - 1)],
                     np.float32), (batch, 1, 1))),
        "gt_masks": jnp.asarray(masks),
    }

    step_fn = make_train_step(
        model, cfg, tx, trainable=trainable_mask(variables, stage))

    @jax.jit
    def run(state, key, data):
        def body(_, carry):
            st, k, acc = carry
            k, sub = jax.random.split(k)
            st, losses = step_fn(st, sub, data)
            # losses reach the output -> the whole step survives DCE
            return (st, k, acc + losses["total"])
        st, _, acc = lax.fori_loop(0, iters, body, (state, key, 0.0))
        p0 = jax.tree_util.tree_leaves(st.params)[0]
        return acc + jnp.sum(p0).astype(jnp.float32)

    float(run(state, jax.random.PRNGKey(0), batch_data))  # compile + run
    t0 = time.perf_counter()
    float(run(state, jax.random.PRNGKey(1), batch_data))
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3  # ms/step
    if with_flops:
        flops = program_flops(
            step_fn, state, jax.random.PRNGKey(2), batch_data)
        return ms, (flops / (ms / 1e3) if flops else None)
    return ms


def bench_eval_pipeline(config, batch=8, n_images=32):
    """TRUE end-to-end eval throughput: the CLI's software-pipelined
    ``Detector.dispatch → collect_crops (unmold) → build_coco_results_crops
    (RLE straight off the box crops)`` loop on synthetic 1024² uint8 images
    — device AND host wall-clock, matching the reference's operational
    metric (``amodal_train.py:463-497``).

    Uses the detection-biased checkpoint so every image carries a full
    detection table (~``detection_max_instances`` masks to unmold + encode —
    the reference evaluates with ``DETECTION_MIN_CONFIDENCE = 0``, so a full
    table IS the realistic per-image host load, not a worst case)."""
    import numpy as np

    from sln_amodal_tpu.eval_amodal.coco_results import build_coco_results_crops
    from sln_amodal_tpu.infer import Detector
    from sln_amodal_tpu.utils.synthetic import detection_biased_variables

    det = Detector(config, detection_biased_variables(config))
    rng = np.random.RandomState(0)
    s = config.image_size
    batches = []
    for b in range(0, n_images, batch):
        batches.append([
            rng.randint(0, 256, (s, s, 3), np.uint8)
            for _ in range(min(batch, n_images - b))
        ])

    n_dets = 0

    def drain(handle):
        nonlocal n_dets
        for i, r in enumerate(det.collect_crops(handle)):
            n_dets += len(build_coco_results_crops(
                i + 1, r["rois"], r["class_ids"], r["scores"], r["crops"],
                r["image_shape"]))

    drain(det.dispatch(batches[0]))  # compile + warm the host path
    assert n_dets > 0, "biased checkpoint produced no detections"

    def one_pass():
        t0 = time.perf_counter()
        pending = None
        for imgs in batches:
            handle = det.dispatch(imgs)
            if pending is not None:
                drain(pending)
            pending = handle
        drain(pending)
        return time.perf_counter() - t0

    # best of two passes: the tunneled link's upload throughput swings
    # hour-to-hour (observed 5.3 vs 10.5 img/s for identical code); min-time
    # is the same one-sided-jitter defense loop_time applies
    dt = min(one_pass(), one_pass())
    return n_images / dt


def bench_train_pipeline(steps=8, batch=8, size=1024):
    """Wall-clock ms/step of the REAL training pipeline: DevicePrepLoader
    (file IO + label-map resize on host; sem-dist decode, bbox extraction,
    augmentation, and RPN matching ON DEVICE) feeding the jitted heads-stage
    train step, on a synthetic 1024² COCOA-style dataset. This is the
    data-inclusive number the in-graph ``train_step_ms_b8`` excludes —
    measured 10.0 s/step with the host-numpy loader vs 1.69 s with
    on-device prep on this link (see COMPONENTS.md).

    The first epoch absorbs program cache load + loader warmup; the metric
    is the MIN of the next two epochs' mean step times — the tunneled
    link's throughput swings hour to hour (measured 727 vs 1951 ms/step for
    identical code), and a one-epoch sample inherits that jitter wholesale.
    Min-of-two is the same defense loop_time applies to transport jitter."""
    import os
    import sys

    # exactly the pipeline scripts/train_soak.py validates (path set up
    # relative to this file so the metric works from any cwd)
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from train_soak import build_soak_pipeline

    trainer, loader, config = build_soak_pipeline(
        batch=batch, size=size, device_prep=True, root="/tmp/bench_soak_ds")

    marks = []

    def mark(epoch, params):
        marks.append(time.perf_counter())

    trainer.train_stage(loader, "heads", config.learning_rate, epochs=3,
                        steps_per_epoch=steps, on_epoch_end=mark)
    deltas = [marks[i + 1] - marks[i] for i in range(len(marks) - 1)]
    return min(deltas) / steps * 1e3  # ms/step steady-state, jitter-robust


def bench_nms_kernel(iters=50):
    """Pallas greedy-NMS kernel at the production shape (6000 -> 1000)."""
    import jax.numpy as jnp
    import numpy as np

    from sln_amodal_tpu.ops.nms_pallas import nms_sorted_pallas
    from sln_amodal_tpu.utils.benchmark import loop_time

    rng = np.random.RandomState(0)
    centers = rng.rand(6000, 2) * 900 + 50
    sizes = rng.rand(6000, 2) * 180 + 6
    boxes = jnp.asarray(
        np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
        .astype(np.float32))
    valid = jnp.ones((6000,), bool)
    return loop_time(
        lambda b, v: nms_sorted_pallas(
            b, v, max_outputs=1000, iou_threshold=0.7),
        boxes, (valid,), iters=iters,
    ) * 1e3


def bench_aspp_kernel(config, variables, iters=50):
    """Fused-matmul ASPP at the GLM's full-scale grid ([1, 65, 65, 2048])."""
    import jax.numpy as jnp
    import numpy as np

    from sln_amodal_tpu.models.deeplab import ASPP
    from sln_amodal_tpu.utils.benchmark import loop_time

    aspp = ASPP(config.glm_num_classes, dtype=jnp.bfloat16)
    v = {"params": variables["params"]["glm"]["base"]["aspp"]}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 65, 65, 2048).astype(np.float32)).astype(
        jnp.bfloat16)
    return loop_time(
        lambda c, vv: aspp.apply(vv, c), x, (v,), iters=iters,
    ) * 1e3


def _want(name: str) -> bool:
    """``python bench.py --only REGEX`` runs only matching metrics (search
    semantics). No args = the full suite, unchanged driver behavior."""
    import re

    if "--only" not in sys.argv:
        return True
    pat = sys.argv[sys.argv.index("--only") + 1]
    return re.search(pat, name) is not None


def main() -> None:
    import jax

    from sln_amodal_tpu.utils.runtime import setup_runtime

    setup_runtime()

    from sln_amodal_tpu.config import inference_config
    from sln_amodal_tpu.models.sln import init_params

    config = inference_config(compute_dtype="bfloat16")

    # --- secondary metrics (failures must not kill the headline) -----------
    # The two wall-clock pipeline metrics run FIRST: they are sensitive to
    # process state (live HBM buffers from other benches and long-lived
    # tunnel sessions measurably slow host<->device transfers — observed
    # 5.2 vs 10.5 img/s for the same eval loop late vs early in a run),
    # while the in-graph fori_loop metrics below are immune to it. The
    # shared random param tree is built only after them for the same reason.
    # Every metric runs under run_metric: bounded retries vs transport
    # flakes, explicit error record in the JSON on final failure.
    if _want("eval_pipeline_images_per_sec_1024"):
        ips = run_metric("eval_pipeline_images_per_sec_1024",
                         lambda: bench_eval_pipeline(config))
        if ips is not None:
            emit("eval_pipeline_images_per_sec_1024", ips, "images/s",
                 ips / REFERENCE_IMAGES_PER_SEC)
    if _want("train_pipeline_ms_b8"):
        ms = run_metric("train_pipeline_ms_b8", bench_train_pipeline)
        if ms is not None:
            # vs the reference's est. 1000 ms/step at batch 1 → 8000 ms for 8
            emit("train_pipeline_ms_b8", ms, "ms/step",
                 8 * REFERENCE_TRAIN_STEP_MS / ms)

    variables = init_params(config, jax.random.PRNGKey(0))
    if _want("train_step_ms_b1"):
        ms = run_metric("train_step_ms_b1",
                        lambda: bench_train_step(config, variables, batch=1))
        if ms is not None:
            emit("train_step_ms_b1", ms, "ms/step",
                 REFERENCE_TRAIN_STEP_MS / ms)
    if _want("train_step_ms_b8"):
        ms = run_metric(
            "train_step_ms_b8",
            lambda: bench_train_step(config, variables, batch=8, iters=4))
        if ms is not None:
            emit("train_step_ms_b8", ms, "ms/step",
                 8 * REFERENCE_TRAIN_STEP_MS / ms)  # images/s advantage
    res = None
    if _want("train_step_all_ms_b8"):
        res = run_metric(
            "train_step_all_ms_b8",
            lambda: bench_train_step(config, variables, batch=8, iters=4,
                                     stage="all", with_flops=True))
    if res is not None:
        ms, flops_per_sec = res
        emit("train_step_all_ms_b8", ms, "ms/step",
             8 * REFERENCE_TRAIN_STEP_MS / ms)
        if flops_per_sec is not None:
            mfu = flops_per_sec / PEAK_BF16_FLOPS
            emit("train_step_mfu_b8", mfu, "fraction_of_peak", mfu)
        else:
            print(json.dumps({"metric": "train_step_mfu_b8",
                              "error": "cost_analysis unavailable"}),
                  flush=True)
    if _want("nms_kernel_ms_6000"):
        ms = run_metric("nms_kernel_ms_6000", bench_nms_kernel)
        if ms is not None:
            # vs the exact XLA scalar-loop implementation (10.4 ms measured)
            emit("nms_kernel_ms_6000", ms, "ms", 10.4 / ms)
    if _want("aspp_kernel_ms_65sq"):
        ms = run_metric("aspp_kernel_ms_65sq",
                        lambda: bench_aspp_kernel(config, variables))
        if ms is not None:
            # vs XLA's dilated-conv lowering of the same op (7.18 ms measured)
            emit("aspp_kernel_ms_65sq", ms, "ms", 7.18 / ms)
    if _want("inference_noglm_images_per_sec_1024"):
        ips = run_metric(
            "inference_noglm_images_per_sec_1024",
            lambda: bench_inference(
                config.replace(glm_elide_at_inference=True), variables, 1,
                "infer_detect_only"))
        if ips is not None:
            emit("inference_noglm_images_per_sec_1024", ips, "images/s",
                 ips / REFERENCE_IMAGES_PER_SEC)
    if _want("inference_batch8_images_per_sec_1024"):
        ips = run_metric(
            "inference_batch8_images_per_sec_1024",
            lambda: bench_inference(config, variables, 8, "infer", iters=4))
        if ips is not None:
            emit("inference_batch8_images_per_sec_1024", ips, "images/s",
                 ips / REFERENCE_IMAGES_PER_SEC)
    # --- headline: full-parity batch-1 inference (GLM on), printed last ----
    if not _want("inference_images_per_sec_1024"):
        return
    res = run_metric(
        "inference_images_per_sec_1024",
        lambda: bench_inference(config, variables, 1, "infer",
                                with_flops=True))
    if res is None:
        raise SystemExit("headline metric failed after retries")
    ips, flops_per_sec = res
    if flops_per_sec is not None:
        mfu = flops_per_sec / PEAK_BF16_FLOPS
        emit("inference_mfu_b1", mfu, "fraction_of_peak", mfu)
    else:
        print(json.dumps({"metric": "inference_mfu_b1",
                          "error": "cost_analysis unavailable"}), flush=True)
    emit("inference_images_per_sec_1024", ips, "images/s",
         ips / REFERENCE_IMAGES_PER_SEC)


if __name__ == "__main__":
    main()
