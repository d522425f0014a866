"""Export a checkpoint as an AOT serving artifact.

Usage:
    python -m sln_amodal_tpu.cli.export_model \
        --model ./checkpoints/COCOA.pth --out ./artifacts/cocoa_b8 \
        --batch 8 [--image_size 1024] [--full] [--platforms tpu]

The artifact directory (StableHLO program + params + manifest) is loaded
with ``sln_amodal_tpu.serve.ServingDetector.load(dir)`` — no model code,
tracing, or torch checkpoint handling on the serving host. See
``serve/export.py`` for the format. The reference has no export path; its
deployment story is re-running the training script's loader
(``/root/reference/amodal_test.py:31-41``).
"""

from __future__ import annotations

import argparse
import os

import jax

from ..config import inference_config
from ..models.sln import init_params
from ..serve.export import export_detector
from ..train import checkpoint as ckpt
from ..utils.logging import log


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export an AOT serving artifact.")
    p.add_argument("--model", required=True,
                   help="checkpoint path (.ckpt or reference .pth) or 'random'")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--batch", type=int, default=8,
                   help="static serving batch size (smaller requests are "
                        "padded up by the loader)")
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--glm_weights", default="./checkpoints/deeplabv2.pth")
    p.add_argument("--full", action="store_true",
                   help="export the full contract incl. the GLM global "
                        "label (default: the detect() contract)")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (default: current backend)")
    p.add_argument("--mesh", type=int, default=0,
                   help="export an SPMD data-parallel artifact over this "
                        "many devices (batch sharded, params replicated); "
                        "0 = single-device")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> str:
    from ..utils.runtime import setup_runtime

    setup_runtime()
    args = build_parser().parse_args(argv)
    config = inference_config(image_size=args.image_size)
    template = init_params(config, jax.random.PRNGKey(args.seed))
    if args.model.lower() == "random":
        variables = template
    else:
        glm = args.glm_weights if os.path.exists(args.glm_weights) else None
        variables = ckpt.load_weights(args.model, template, glm_path=glm)
    mesh = None
    if args.mesh and args.mesh > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[: args.mesh])
    out = export_detector(
        config, variables, args.out,
        batch=args.batch,
        detect_only=not args.full,
        platforms=args.platforms,
        mesh=mesh,
    )
    log(f"Exported serving artifact → {out} "
        f"(batch {args.batch}, image {args.image_size}², "
        f"{'full' if args.full else 'detect-only'}"
        f"{f', {args.mesh}-device SPMD' if mesh is not None else ''})")
    return out


if __name__ == "__main__":
    main()
