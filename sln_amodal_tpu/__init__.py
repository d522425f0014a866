"""SLN-Amodal-TPU: a TPU-native framework for amodal instance segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
apchenstu/SLN-Amodal ("Learning Semantics-aware Distance Map with Semantics
Layering Network for Amodal Instance Segmentation", ACM MM 2019):

- sem-dist (semantics-aware distance / level-set) uint64 data representation
  (:mod:`sln_amodal_tpu.data.semdist`)
- semantic layering network: ResNet-101-FPN Mask R-CNN with a frozen
  DeepLabV2-MSC global semantic prior (GLM) feeding a layer-mask head
  (:mod:`sln_amodal_tpu.models`)
- amodal evaluation protocol: COCO-style AP/AR sliced by occlusion rate and
  things/stuff (:mod:`sln_amodal_tpu.eval_amodal`)

Design stance (TPU-first, not a port):
- pure-functional model graphs (flax.linen) with static padded shapes
  everywhere the reference used dynamic filtering,
- one jitted train step / one jitted inference step,
- `jax.sharding.Mesh` + NamedSharding data parallelism over ICI,
- Pallas kernels for the hot custom ops (NMS, crop-and-resize),
- a C++ RLE mask library for host-side evaluation.
"""

__version__ = "0.1.0"
