"""Batch>1 training soak on the real TPU (VERDICT round-1 item #10).

Builds a synthetic 1024² COCOA-style dataset on the fly, then runs one
heads-stage epoch at the requested batch size through the REAL pipeline
(TrainLoader host prefetch -> jitted train step), asserting finite,
decreasing losses and recording step time.

Usage: python scripts/train_soak.py [--batch 8] [--steps 50] [--size 1024]
       [--device_prep]

``build_soak_pipeline`` is also imported by bench.py (train_pipeline_ms_b8)
so the benched pipeline is exactly the one this soak validates.
"""
import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def build_soak_pipeline(batch=8, size=1024, device_prep=False,
                        root="/tmp/soak_ds", name="soak"):
    """(trainer, loader, config) for the synthetic training soak: a
    synthetic COCOA-style dataset on disk, a single-device Trainer, and
    the real loader (host-numpy TrainLoader, or DevicePrepLoader with
    on-TPU target construction when ``device_prep``)."""
    import jax

    from fixtures import make_synthetic_dataset
    from sln_amodal_tpu.config import training_config
    from sln_amodal_tpu.data.dataset import AmodalDataset
    from sln_amodal_tpu.data.pipeline import TrainLoader
    from sln_amodal_tpu.models.sln import init_params
    from sln_amodal_tpu.parallel.mesh import make_mesh
    from sln_amodal_tpu.train.trainer import Trainer

    make_synthetic_dataset(root, n_images=8, size=size)
    dataset = AmodalDataset()
    dataset.load_amodal(root, "train")
    dataset.prepare()

    config = training_config(image_size=size, batch_size=batch, name=name)
    variables = init_params(config, jax.random.PRNGKey(0))
    trainer = Trainer(config, variables, mesh=make_mesh(jax.devices()[:1]))
    loader_cls = TrainLoader
    if device_prep:
        from sln_amodal_tpu.data.device_prep import DevicePrepLoader
        loader_cls = DevicePrepLoader
    loader = loader_cls(dataset, config, batch_size=batch, seed=0)
    return trainer, loader, config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--root", default="/tmp/soak_ds")
    ap.add_argument("--device_prep", action="store_true",
                    help="use DevicePrepLoader (on-device target build)")
    args = ap.parse_args()

    from sln_amodal_tpu.utils.runtime import setup_runtime

    setup_runtime()

    import numpy as np

    trainer, loader, config = build_soak_pipeline(
        batch=args.batch, size=args.size, device_prep=args.device_prep,
        root=args.root,
    )

    t0 = time.time()
    losses = trainer.train_stage(
        loader, "heads", config.learning_rate, epochs=1,
        steps_per_epoch=args.steps,
    )
    wall = time.time() - t0
    assert np.isfinite(losses["total"]), losses
    print(
        f"SOAK OK: batch={args.batch} steps={args.steps} size={args.size} "
        f"final_total={losses['total']:.4f} wall={wall:.1f}s "
        f"(~{wall / args.steps * 1e3:.0f} ms/step incl. first-step compile)"
    )


if __name__ == "__main__":
    main()
