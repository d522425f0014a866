"""Train / evaluate CLI — the reference ``amodal_train.py`` surface
(``/root/reference/amodal_train.py:507-675``) on the TPU-native stack.

Usage:
    python -m sln_amodal_tpu.cli.train train --dataset /path/coco_amodal \
        --model coco --data_type COCOA
    python -m sln_amodal_tpu.cli.train evaluate --dataset /path/coco_amodal \
        --model ./checkpoints/COCOA.pth --data_type COCOA --limit 100
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..config import inference_config, training_config
from ..data.dataset import AmodalDataset, DetectionResults
from ..data.pipeline import TrainLoader
from ..eval_amodal.amodal_eval import AmodalEval, evaluate_sweep
from ..eval_amodal.coco_results import build_coco_results_crops
from ..infer import Detector
from ..models.sln import init_params
from ..train import checkpoint as ckpt
from ..train.trainer import Trainer
from ..utils.logging import log, print_network, progress_bar

DEFAULT_COCO_WEIGHTS = "./checkpoints/mask_rcnn_coco.pth"
DEFAULT_GLM_WEIGHTS = "./checkpoints/deeplabv2.pth"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train SLN-Amodal-TPU.")
    p.add_argument("command", metavar="<command>", help="'train' or 'evaluate'")
    p.add_argument("--dataset", required=True, help="COCO-amodal dataset root")
    p.add_argument("--year", default="2014")
    p.add_argument("--model", required=False,
                   help="checkpoint path, 'coco', 'last', or 'random'")
    p.add_argument("--logs", default="./logs")
    p.add_argument("--limit", type=int, default=-1,
                   help="images for evaluation (-1 = all)")
    p.add_argument("--data_type", default="COCOA", choices=["COCOA", "D2SA"])
    p.add_argument("--glm_weights", default=DEFAULT_GLM_WEIGHTS)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=2500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sticky_freeze", action="store_true",
                   help="reproduce the reference's sticky layer freezing")
    p.add_argument("--eval_batch", type=int, default=8,
                   help="images per device batch during evaluation (8 is "
                        "~22%% faster than 1 on TPU; detections are "
                        "batch-size invariant, see test_multilayer_batch)")
    p.add_argument("--stage", default=None,
                   help="train only this stage (heads/3+/4+/5+/all) instead "
                        "of the full 3-stage schedule")
    p.add_argument("--epochs", type=int, default=1,
                   help="epochs when --stage is given")
    p.add_argument("--validate_steps", type=int, default=0,
                   help="run N validation batches after each epoch")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint in --logs: "
                        "params always, plus optimizer momentum/step when a "
                        ".state file exists (mid-stage resume)")
    p.add_argument("--data_parallel", action="store_true",
                   help="evaluate: shard each eval batch over ALL local "
                        "devices (SPMD data-parallel serving; detections "
                        "are identical to single-device, see "
                        "test_sharded_infer)")
    p.add_argument("--device_prep", action="store_true",
                   help="build training targets (sem-dist decode, bboxes, "
                        "RPN matching) on the TPU instead of host numpy — "
                        "~100x less host work per sample; equivalence pinned "
                        "by tests/test_device_prep")
    p.add_argument("--coordinator", default=None,
                   help="multi-host training: host:port of process 0 "
                        "(launch one process per host with --num_processes "
                        "and --process_id; batches assemble into one global "
                        "mesh, see parallel/multihost.py)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler device trace of the whole "
                        "run into this directory (TensorBoard-loadable; "
                        "keep the run small — pair with --limit or "
                        "--steps_per_epoch)")
    return p


def resolve_weights(args, config, template):
    """Reference weight selection: path | 'coco' | 'last' | fresh init."""
    model_path = args.model or ""
    if model_path.lower() == "coco":
        model_path = DEFAULT_COCO_WEIGHTS
    elif model_path.lower() == "last":
        model_path, _ = ckpt.find_last(args.logs, config.name)
        model_path = model_path or ""
    if model_path and model_path.lower() not in ("random",) and os.path.exists(model_path):
        log(f"Loading weights {model_path}")
        glm = args.glm_weights if os.path.exists(args.glm_weights) else None
        return ckpt.load_weights(model_path, template, glm_path=glm)
    if model_path and model_path.lower() != "random":
        log(f"Weight file not found: {model_path} — using random init")
    return template


def run_evaluate(args) -> None:
    config = inference_config(
        image_size=args.image_size,
        name=f"{args.data_type.lower()}",
    )
    dataset = AmodalDataset()
    data_type = "COCO" if args.data_type == "COCOA" else "D2S"
    coco = dataset.load_amodal(args.dataset, "val", data_type=data_type, year=args.year)
    dataset.prepare()

    template = init_params(config, jax.random.PRNGKey(args.seed))
    variables = resolve_weights(args, config, template)
    mesh = None
    if getattr(args, "data_parallel", False):
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
        log(f"Data-parallel eval over {mesh.devices.size} device(s)")
    detector = Detector(config, variables, mesh=mesh)

    image_ids = dataset.image_ids
    if args.limit and args.limit > 0:
        image_ids = image_ids[: args.limit]

    results = []
    t0 = time.time()
    bsz = max(1, args.eval_batch)
    # Software-pipelined loop: dispatch batch N to the device, then unmold
    # + RLE-encode batch N-1 on the host while N computes (JAX async
    # dispatch). The reference runs these strictly sequentially
    # (amodal_train.py:463-497).
    pending = None  # (chunk, n_real, PendingDetect)

    def drain(entry):
        chunk, n_real, handle = entry
        # crops path: RLE straight from each box crop — identical result
        # dicts to the full-frame path (build_coco_results_crops docstring)
        for image_id, r in zip(chunk, detector.collect_crops(handle)[:n_real]):
            results.extend(
                build_coco_results_crops(
                    dataset.image_info[image_id]["id"],
                    r["rois"], r["class_ids"], r["scores"], r["crops"],
                    r["image_shape"],
                )
            )

    done = 0
    for start in range(0, len(image_ids), bsz):
        chunk = [int(i) for i in image_ids[start : start + bsz]]
        images = [dataset.load_image(i) for i in chunk]
        # pad the final partial batch to keep one compiled program
        n_real = len(images)
        while len(images) < bsz:
            images.append(images[-1])
        handle = detector.dispatch(images)
        if pending is not None:
            drain(pending)
            done += pending[1]
            progress_bar(done, len(image_ids), prefix="eval")
        pending = (chunk, n_real, handle)
    if pending is not None:
        drain(pending)
        progress_bar(len(image_ids), len(image_ids), prefix="eval")
    elapsed = time.time() - t0
    log(f"Prediction time: {elapsed:.1f}s — {len(image_ids) / max(elapsed, 1e-9):.2f} images/s")

    if not results:
        log("no detections produced")
        return None
    dt = DetectionResults(results)
    order_key = "order" if args.data_type == "COCOA" else "amodal_region.order"
    ev = AmodalEval(coco, dt, order_key=order_key)
    # evaluate exactly the images detections were produced for (the reference
    # pins cocoEval.params.imgIds to the detected ids, amodal_train.py:490);
    # a bare [:limit] over JSON order could score a different image set.
    ev.params.img_ids = [
        dataset.image_info[int(i)]["id"] for i in image_ids
    ]
    return evaluate_sweep(ev)


def run_train(args) -> None:
    config = training_config(
        image_size=args.image_size,
        batch_size=args.batch_size,
        steps_per_epoch=args.steps_per_epoch,
        name=f"{args.data_type.lower()}",
    )
    config.display()

    data_type = "COCO" if args.data_type == "COCOA" else "D2S"
    train_ds = AmodalDataset()
    train_ds.load_amodal(args.dataset, "train", data_type=data_type, year=args.year)
    train_ds.prepare()

    val_loader = None
    if args.validate_steps > 0:
        val_ds = AmodalDataset()
        val_ds.load_amodal(args.dataset, "val", data_type=data_type, year=args.year)
        val_ds.prepare()

    template = init_params(config, jax.random.PRNGKey(args.seed))

    resume_epoch, resume_state_path = 0, None
    if getattr(args, "resume", False):
        last_path, last_epoch = ckpt.find_last(args.logs, config.name)
        if last_path is not None:
            log(f"Resuming from {last_path} (epoch {last_epoch})")
            args.model = last_path
            resume_epoch = last_epoch
            if os.path.exists(last_path + ".state"):
                resume_state_path = last_path + ".state"
        else:
            log(f"--resume: no checkpoint under {args.logs}/{config.name} — "
                "starting fresh")

    # a resume at/past the end of the requested schedule would run zero
    # epochs — say so (and bail before loading weights / building loaders)
    if args.stage:
        total_epochs = args.epochs
        advice = "raise --epochs"
    else:
        from ..train.optim import StageSchedule
        total_epochs = sum(e for _, _, e in
                           StageSchedule(config.learning_rate).stages)
        advice = "use --stage <stage> --epochs N"
    if resume_epoch >= total_epochs:
        log(f"--resume: checkpoint is at epoch {resume_epoch}, requested "
            f"schedule ends at epoch {total_epochs} — nothing left to train "
            f"({advice}, or start a fresh --logs dir)")
        return

    variables = resolve_weights(args, config, template)
    print_network(variables, "sln_amodal")

    trainer = Trainer(config, variables)
    loader_cls, loader_kw = TrainLoader, {}
    if args.device_prep:
        from ..data.device_prep import DevicePrepLoader
        # prep shards over the same mesh as the train step (SPMD data prep)
        loader_cls, loader_kw = DevicePrepLoader, {"mesh": trainer.mesh}
    loader = loader_cls(train_ds, config, seed=args.seed, **loader_kw)

    if args.validate_steps > 0:
        val_loader = loader_cls(
            val_ds, config, seed=args.seed + 1, augment=False, **loader_kw)

    def save_epoch(epoch, params):
        path = ckpt.save(params, args.logs, config.name, epoch)
        if trainer.last_state is not None:
            ckpt.save_train_state(trainer.last_state, args.logs, config.name, epoch)
        log(f"checkpoint: {path}")
        if val_loader is not None:
            trainer.variables = params
            vl = trainer.validate(val_loader, steps=args.validate_steps)
            log("  val " + " ".join(f"{k}={v:.4f}" for k, v in sorted(vl.items())))

    if args.stage:
        trainer.epoch = resume_epoch
        trainer.train_stage(
            loader, args.stage, config.learning_rate, args.epochs,
            steps_per_epoch=args.steps_per_epoch, on_epoch_end=save_epoch,
            resume_state_path=resume_state_path, start_epoch=resume_epoch,
        )
    else:
        trainer.train(
            loader,
            steps_per_epoch=args.steps_per_epoch,
            sticky_freeze=args.sticky_freeze,
            on_epoch_end=save_epoch,
            resume_epoch=resume_epoch,
            resume_state_path=resume_state_path,
        )


def main(argv=None) -> None:
    from ..utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)
    if args.num_processes and args.num_processes > 1:
        # must precede any backend initialization (device queries)
        from ..parallel.multihost import initialize
        initialize(args.coordinator, args.num_processes, args.process_id)
        log(f"Multi-host: process {jax.process_index()}/{jax.process_count()}"
            f" — {len(jax.local_devices())} local / {len(jax.devices())}"
            " global devices")
    log(f"Command: {args.command}")
    log(f"Dataset: {args.dataset}")
    log(f"Model:   {args.model}")
    import contextlib

    tracing = contextlib.nullcontext()
    if getattr(args, "trace_dir", None):
        from ..utils import profiling
        tracing = profiling.trace(args.trace_dir)
        log(f"Profiler trace → {args.trace_dir}")
    with tracing:
        if args.command == "train":
            run_train(args)
        elif args.command == "evaluate":
            run_evaluate(args)
        else:
            print(f"'{args.command}' is not recognized. "
                  "Use 'train' or 'evaluate'")


if __name__ == "__main__":
    main()
