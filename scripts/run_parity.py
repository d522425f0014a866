"""One-command real-weights AP parity check (BASELINE.md targets 1-2).

The north-star parity gate — "converted ``COCOA.pth``/``D2SA.pth`` scores
within 0.5 AP points of the reference on the real dataset" — cannot be
executed in this environment (no released weights, no dataset), so this
script captures the recipe as an executable artifact: when weights and data
appear, the check is ONE command.

    python scripts/run_parity.py \
        --model /path/COCOA.pth --glm_weights /path/deeplabv2.pth \
        --dataset /path/to/cocoa --data_type COCOA \
        --ref_stats /path/reference_sweep.json [--gate 0.5]

Pipeline: convert the reference torch checkpoint on the fly
(``convert/torch_weights.py``, the reference's load path
``/root/reference/amodal_train.py:616-621``) → run our full inference +
12-way evaluation sweep (``cli/train.py::run_evaluate``, matching
``amodal_train.py:463-497`` + ``Functions.py:919-1007``) → compare every
sweep slice against the reference's numbers and verdict vs the gate.

``--ref_stats`` is a JSON mapping sweep slices to stat arrays, e.g.
``{"both/all": [0.312, ...], "things/all": [...]}`` — partial maps are
fine (only provided slices are compared); record the reference's printout
into this format once per weights release.

``--dry_run DIR`` needs no weights or data: builds a synthetic dataset,
exports a random-init model to the reference ``.pth`` layout
(``convert/torch_export.py``), and runs the full parity pipeline twice —
native checkpoint vs round-tripped ``.pth`` — which must agree to delta 0.
CI pins this via ``tests/test_run_parity.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _eval_args(model: str, glm: str, dataset: str, data_type: str,
               limit: int, image_size: int, eval_batch: int):
    """Namespace for cli.train.run_evaluate (the real eval entry point)."""
    return argparse.Namespace(
        model=model, glm_weights=glm or "", dataset=dataset,
        data_type=data_type, limit=limit, image_size=image_size,
        eval_batch=eval_batch, year="2014", seed=0, logs="/tmp/parity_logs",
        data_parallel=False,
    )


def run_sweep(model: str, glm: str, dataset: str, data_type: str,
              limit: int = 0, image_size: int = 1024, eval_batch: int = 8):
    from sln_amodal_tpu.cli.train import run_evaluate

    sweep = run_evaluate(_eval_args(
        model, glm, dataset, data_type, limit, image_size, eval_batch))
    if sweep is None:
        raise SystemExit("evaluation produced no detections — wrong weights?")
    return {k: [float(x) for x in v] for k, v in sweep.items()}


def compare(ours: dict, ref: dict, gate: float) -> bool:
    """Print per-slice AP deltas; True iff every compared AP is within
    ``gate`` points (reference stats are in points-fraction, ours too)."""
    ok = True
    print(f"\n{'slice':<24} {'ours':>8} {'ref':>8} {'delta':>8}  gate ±{gate}")
    for key, ref_stats in sorted(ref.items()):
        if key not in ours:
            print(f"{key:<24} {'—':>8} (no such sweep slice here) MISSING")
            ok = False
            continue
        # compare AP (stat 0); extend to all 6 stats when provided
        n = min(len(ref_stats), len(ours[key]))
        for i in range(n):
            delta = (ours[key][i] - ref_stats[i]) * 100.0  # AP points
            verdict = "ok" if abs(delta) <= gate else "FAIL"
            if verdict == "FAIL":
                ok = False
            name = ("AP", "AP50", "AP75", "AR@1", "AR@10", "AR@100")[i]
            print(f"{key + ':' + name:<24} {ours[key][i] * 100:8.2f} "
                  f"{ref_stats[i] * 100:8.2f} {delta:+8.2f}  {verdict}")
    return ok


def dry_run(workdir: str) -> None:
    """No-weights rehearsal: random init exported to the reference .pth
    layout must evaluate identically to the native checkpoint it came
    from — proves the convert→evaluate→sweep plumbing end to end."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from fixtures import make_synthetic_dataset

    from sln_amodal_tpu.config import inference_config
    from sln_amodal_tpu.convert.torch_export import save_torch_checkpoint
    from sln_amodal_tpu.train import checkpoint as ckpt
    from sln_amodal_tpu.utils.synthetic import detection_biased_variables

    os.makedirs(workdir, exist_ok=True)
    ds_root = os.path.join(workdir, "ds")
    size = 64
    make_synthetic_dataset(ds_root, n_images=3, size=size, subset="val")

    cfg = inference_config(image_size=size, name="cocoa")
    # random init emits zero detections; the library's biased init makes
    # real detections (= top anchors) flow through the whole sweep
    params = detection_biased_variables(cfg)

    native = ckpt.save(params, workdir, "parity", 1)
    pth = os.path.join(workdir, "roundtrip.pth")
    save_torch_checkpoint(params, pth)

    a = run_sweep(native, "", ds_root, "COCOA", image_size=size, eval_batch=2)
    b = run_sweep(pth, "", ds_root, "COCOA", image_size=size, eval_batch=2)
    ok = compare(b, a, gate=0.0)
    if not ok:
        raise SystemExit("dry run FAILED: .pth round trip changed the sweep")
    print("\ndry run OK: native ckpt and round-tripped .pth sweeps identical")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", help="reference COCOA.pth / D2SA.pth "
                                    "(or a native .ckpt)")
    ap.add_argument("--glm_weights", default="", help="deeplabv2.pth")
    ap.add_argument("--dataset", help="dataset root (val subset)")
    ap.add_argument("--data_type", default="COCOA",
                    choices=["COCOA", "D2SA"])
    ap.add_argument("--ref_stats", default=None,
                    help="JSON {sweep_slice: [AP, AP50, ...]} from the "
                         "reference run")
    ap.add_argument("--gate", type=float, default=0.5,
                    help="max |AP delta| in points (BASELINE.md: 0.5)")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--image_size", type=int, default=1024)
    ap.add_argument("--eval_batch", type=int, default=8)
    ap.add_argument("--save_stats", default=None,
                    help="write our sweep stats JSON here (becomes the "
                         "--ref_stats input for cross-checking runs)")
    ap.add_argument("--dry_run", default=None, metavar="DIR",
                    help="no-weights rehearsal in DIR (synthetic data, "
                         "random init, .pth round trip; gate 0)")
    args = ap.parse_args()

    from sln_amodal_tpu.utils.runtime import setup_runtime
    setup_runtime()

    if args.dry_run:
        dry_run(args.dry_run)
        return
    if not args.model or not args.dataset:
        ap.error("--model and --dataset are required (or use --dry_run DIR)")

    ours = run_sweep(args.model, args.glm_weights, args.dataset,
                     args.data_type, args.limit, args.image_size,
                     args.eval_batch)
    if args.save_stats:
        with open(args.save_stats, "w") as f:
            json.dump(ours, f, indent=1)
        print(f"sweep stats written to {args.save_stats}")
    if args.ref_stats:
        with open(args.ref_stats) as f:
            ref = json.load(f)
        if not compare(ours, ref, args.gate):
            raise SystemExit(1)
        print(f"\nPARITY OK: every compared stat within {args.gate} AP points")
    elif not args.save_stats:
        print("(no --ref_stats given — nothing to compare; "
              "use --save_stats to record this run)")


if __name__ == "__main__":
    main()
