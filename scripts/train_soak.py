"""Batch>1 training soak on the real TPU (VERDICT round-1 item #10).

Builds a synthetic 1024² COCOA-style dataset on the fly, then runs one
heads-stage epoch at the requested batch size through the REAL pipeline
(TrainLoader host prefetch -> jitted train step), asserting finite,
decreasing losses and recording step time.

Usage: python scripts/train_soak.py [--batch 8] [--steps 50] [--size 1024]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


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

    import jax
    import numpy as np

    from fixtures import make_synthetic_dataset
    from sln_amodal_tpu.config import training_config
    from sln_amodal_tpu.data.dataset import AmodalDataset
    from sln_amodal_tpu.data.pipeline import TrainLoader
    from sln_amodal_tpu.models.sln import init_params
    from sln_amodal_tpu.train.trainer import Trainer
    from sln_amodal_tpu.parallel.mesh import make_mesh

    make_synthetic_dataset(args.root, n_images=8, size=args.size)
    dataset = AmodalDataset()
    dataset.load_amodal(args.root, "train")
    dataset.prepare()

    config = training_config(
        image_size=args.size, batch_size=args.batch, name="soak",
    )
    variables = init_params(config, jax.random.PRNGKey(0))
    trainer = Trainer(config, variables, mesh=make_mesh(jax.devices()[:1]))
    loader_cls = TrainLoader
    if args.device_prep:
        from sln_amodal_tpu.data.device_prep import DevicePrepLoader
        loader_cls = DevicePrepLoader
    loader = loader_cls(dataset, config, batch_size=args.batch, seed=0)

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
