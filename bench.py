#!/usr/bin/env python
"""End-to-end inference benchmark on real TPU hardware.

Headline metric (BASELINE.md parity target #3): full-pipeline val inference
images/sec at the reference's operating point — 1024x1024 images through
GLM (DeepLab-MSC @513, 3 scales) + ResNet-101-FPN + RPN + proposal NMS +
classifier + detection + mask head, single chip, batch 1.

The reference publishes no number (BASELINE.md); ``REFERENCE_IMAGES_PER_SEC``
is our documented estimate for the PyTorch-0.4 single-GPU (8 GB, 2019-era)
reference pipeline, used only to fill ``vs_baseline``.

Prints exactly one JSON line.
"""

import json
import time

REFERENCE_IMAGES_PER_SEC = 2.0  # estimated reference throughput (unpublished)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sln_amodal_tpu.utils.runtime import setup_runtime

    setup_runtime()

    from sln_amodal_tpu.config import inference_config
    from sln_amodal_tpu.models.sln import SLNAmodal, init_params

    config = inference_config(compute_dtype="bfloat16")
    model = SLNAmodal(config)
    variables = init_params(config, jax.random.PRNGKey(0))

    s = config.image_size
    images = jnp.zeros((1, s, s, 3), jnp.float32)
    windows = jnp.asarray([[0.0, 0.0, float(s), float(s)]], jnp.float32)

    @jax.jit
    def infer(v, images, windows):
        out = model.apply(v, images, windows)
        return out.detections, out.masks

    # warmup / compile. Each timed iteration's input depends on the previous
    # iteration's output and the final scalar is fetched to host — guards
    # against async-dispatch undercounting on experimental PJRT platforms.
    def step(images):
        d, m = infer(variables, images, windows)
        return images + (d.sum() + m.sum()).astype(images.dtype) * 0.0, d

    x, d = step(images)
    float(d.sum())

    n = 16
    t0 = time.perf_counter()
    x = images
    for _ in range(n):
        x, d = step(x)
    float(d.sum())  # host fetch forces completion of the whole chain
    dt = time.perf_counter() - t0

    ips = n / dt
    print(
        json.dumps(
            {
                "metric": "inference_images_per_sec_1024",
                "value": round(ips, 3),
                "unit": "images/s",
                "vs_baseline": round(ips / REFERENCE_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
