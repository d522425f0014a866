"""AOT model export for production serving.

The reference has no deployment story beyond "load the .pth inside the
training script" (``/root/reference/model.py:287-302``). For TPU serving we
export the jitted inference program as a **versioned StableHLO artifact**
(:mod:`jax.export`) plus the parameter tree and a manifest, so a serving
host can run detection

- without the flax model definition, retracing or recompiling Python-side
  model code (the artifact is the compiled-from graph itself), and
- with jax.export's cross-version compatibility guarantees (the artifact
  carries its serialization version and lowering platforms).

Artifact layout (a directory)::

    model.shlo      serialized jax.export.Exported:
                    (variables, images_u8 [B,S,S,3], windows [B,4]) -> outputs
    params.msgpack  flax-serialized parameter tree (same tree the program
                    was exported against)
    manifest.json   config fields + batch/detect_only/platforms/jax version

The exported program is the same one ``Detector`` jits
(``sln_amodal_tpu/infer.py::_jitted_infer``): uint8 resized images in, the
mean-pixel mold on device, ``DetectOutputs``/``InferenceOutputs`` out.

Note on kernels: the NMS implementation is chosen at trace time
(``config.nms_impl='auto'`` → Pallas on TPU, pure-XLA elsewhere — both
bit-identical). Export on the target platform to embed the Pallas kernel;
an artifact exported on CPU for CPU uses the XLA path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..config import Config
from ..infer import Detector, _jitted_infer
from ..models.sln import DetectOutputs, InferenceOutputs

MODEL_FILE = "model.shlo"
PARAMS_FILE = "params.msgpack"
MANIFEST_FILE = "manifest.json"

# Output trees are NamedTuples; jax.export needs a registered stable name
# to serialize their pytree structure. Idempotence guard: jax raises on
# double registration (e.g. repeated module reload in tests).
_REGISTERED = False


def _register_output_trees() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    jax_export.register_namedtuple_serialization(
        DetectOutputs, serialized_name="sln_amodal_tpu.DetectOutputs")
    jax_export.register_namedtuple_serialization(
        InferenceOutputs, serialized_name="sln_amodal_tpu.InferenceOutputs")
    _REGISTERED = True


def export_detector(
    config: Config,
    variables: Any,
    out_dir: str,
    *,
    batch: int = 8,
    detect_only: bool = True,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
) -> str:
    """Export the inference program + params + manifest to ``out_dir``.

    Args:
        config: inference config (its ``image_size`` fixes the input shape).
        variables: the parameter tree to serve (also defines the tree
            structure the artifact expects at call time).
        batch: static serving batch size baked into the artifact. Smaller
            request batches are padded up by the loader.
        detect_only: export the ``detect()`` contract (GLM global label
            elided — reference ``model.py:464-514`` discards it). False
            additionally returns the full-res GLM argmax label.
        platforms: lowering platforms (e.g. ``("tpu",)``); default = the
            current backend.
        mesh: a 1-D ``('data',)`` ``jax.sharding.Mesh`` for an SPMD
            data-parallel artifact (params replicated, batch sharded over
            the mesh — multi-chip serving). The loading host must provide
            the same number of devices; ``batch`` must divide by it.

    Returns ``out_dir``.
    """
    import flax.serialization

    _register_output_trees()
    os.makedirs(out_dir, exist_ok=True)

    if mesh is not None and batch % mesh.devices.size != 0:
        raise ValueError(
            f"batch {batch} not divisible by mesh size {mesh.devices.size}")
    run = _jitted_infer(config, detect_only, mesh)
    s = config.image_size
    v_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype),
        variables,
    )
    img_spec = jax.ShapeDtypeStruct((batch, s, s, 3), jnp.uint8)
    win_spec = jax.ShapeDtypeStruct((batch, 4), jnp.float32)

    exported = jax_export.export(
        run, platforms=tuple(platforms) if platforms else None
    )(v_spec, img_spec, win_spec)

    with open(os.path.join(out_dir, MODEL_FILE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, PARAMS_FILE), "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    manifest = {
        "format_version": 1,
        "config": dataclasses.asdict(config),
        "batch": batch,
        "detect_only": detect_only,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "mesh_size": int(mesh.devices.size) if mesh is not None else 1,
        "outputs": list(
            (DetectOutputs if detect_only else InferenceOutputs)._fields),
    }
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


def _config_from_manifest(fields: dict) -> Config:
    """Rebuild a Config from JSON (lists back to the tuples jit hashing
    needs)."""
    kw = {}
    for f in dataclasses.fields(Config):
        if f.name not in fields:
            continue  # forward-compat: older artifact, newer Config default
        v = fields[f.name]
        kw[f.name] = tuple(v) if isinstance(v, list) else v
    return Config(**kw)


class ServingDetector(Detector):
    """A :class:`Detector` backed by a deserialized AOT artifact instead of
    a freshly traced flax program. Same ``dispatch``/``collect``/``detect``
    host API; request batches smaller than the artifact's static batch are
    padded up (pad outputs are sliced off before unmold).
    """

    def __init__(self, config: Config, variables: Any, exported, batch: int,
                 detect_only: bool, mesh=None):
        self.config = config
        self.mesh = mesh
        if mesh is None:
            self.variables = jax.device_put(variables)
        else:
            from ..parallel.mesh import replicate
            self.variables = jax.device_put(variables, replicate(mesh))
        self.detect_only = detect_only
        self.last_global_label = None
        self.batch = batch
        self._call = jax.jit(exported.call)
        self._infer = self._padded_call

    @classmethod
    def load(cls, artifact_dir: str) -> "ServingDetector":
        import flax.serialization

        _register_output_trees()
        with open(os.path.join(artifact_dir, MANIFEST_FILE)) as f:
            manifest = json.load(f)
        with open(os.path.join(artifact_dir, MODEL_FILE), "rb") as f:
            exported = jax_export.deserialize(f.read())
        with open(os.path.join(artifact_dir, PARAMS_FILE), "rb") as f:
            variables = flax.serialization.msgpack_restore(f.read())
        mesh = None
        mesh_size = int(manifest.get("mesh_size", 1))
        if mesh_size > 1:
            from ..parallel.mesh import make_mesh
            devices = jax.devices()
            if len(devices) < mesh_size:
                raise ValueError(
                    f"artifact was exported for a {mesh_size}-device mesh; "
                    f"only {len(devices)} device(s) available")
            mesh = make_mesh(devices[:mesh_size])
        return cls(
            _config_from_manifest(manifest["config"]),
            variables,
            exported,
            batch=int(manifest["batch"]),
            detect_only=bool(manifest["detect_only"]),
            mesh=mesh,
        )

    def _padded_call(self, variables, images, windows):
        b = images.shape[0]
        pad = self.batch - b
        if pad < 0:
            raise ValueError(
                f"request batch {b} > artifact batch {self.batch}; "
                "split the request or re-export with a larger batch")
        if pad:
            images = jnp.concatenate(
                [images, jnp.repeat(images[-1:], pad, axis=0)])
            windows = jnp.concatenate(
                [windows, jnp.repeat(windows[-1:], pad, axis=0)])
        if self.mesh is not None:
            # commit inputs to the exported program's batch sharding —
            # uncommitted args would fail the multi-device calling
            # convention's sharding check
            from ..parallel.mesh import batch_sharding
            sh = batch_sharding(self.mesh)
            images = jax.device_put(images, sh)
            windows = jax.device_put(windows, sh)
        out = self._call(variables, images, windows)
        if pad:
            out = jax.tree_util.tree_map(lambda a: a[:b], out)
        return out
