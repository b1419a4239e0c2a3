"""vst_tpu — TPU-native video style transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Maboroshi0327/Video-Style-Transfer (RTNSTV, ReCoNet, AdaAttN), designed
TPU-first:

- NHWC tensor layout everywhere (TPU/XLA native; the reference is NCHW torch).
- Pure-functional models over flat parameter dicts keyed by the reference's
  PyTorch ``state_dict`` names, so reference checkpoints convert losslessly.
- Losses and warps run in-graph on device; optical-flow warping never bounces
  through host NumPy.
- AdaAttN's cosine attention is evaluated in closed linear form (O(n·c²))
  instead of materializing the (hw)² attention matrix; softmax attention uses
  a blockwise flash-style evaluation.
- Data parallel scale-out via ``jax.sharding.Mesh`` + NamedSharding.

Subpackages
-----------
ops       — numeric/image primitives with exact PyTorch-parity semantics (L0)
models    — VGG16/19 feature extractors and the stylization model families (L1/L2)
losses    — perceptual/temporal/AdaAttN loss functions (L3)
data      — flow file I/O, datasets, host→device pipelines (L4)
train     — configs, train states, jitted train steps, checkpointing (L5)
infer     — image and streaming video inference (L5)
eval      — SSIM/KL/Gram/LPIPS/SIFID/temporal metrics (L6)
compat    — PyTorch .pth ↔ param-tree converters
parallel  — mesh/sharding helpers
kernels   — Pallas TPU kernels for the hot ops
"""

__version__ = "0.1.0"
