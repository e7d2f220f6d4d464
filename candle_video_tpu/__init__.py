"""candle_video_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-video framework.

Re-implementation of the capabilities of the `candle-video` reference crate
(LTX-Video inference: DiT transformer, 3D causal VAE, flow-matching Euler
scheduler, T5-XXL text encoder incl. GGUF quantized weights), redesigned
TPU-first:

- compute path is pure-functional JAX under ``jit`` (static shapes,
  ``lax.scan`` loops, BF16 matmuls on the MXU with pinned f32 upcasts),
- attention runs through a Pallas flash-attention kernel on TPU,
- multi-chip scale-out uses ``jax.sharding.Mesh`` + explicit shardings
  (tensor-parallel DiT for the 13B model) instead of NCCL,
- the GGUF block-dequantization runs through a native C++ kernel library.

Package layout mirrors the reference's layer map (see SURVEY.md §1):
``ops/`` (L0 kernels), ``models/ltx_video`` (L2-L5), ``parallel/`` (mesh),
``utils/`` (L1), ``quant/`` (GGUF), ``cli.py`` (L6).
"""

__version__ = "0.1.0"
