"""vit_with_opencl_tpu — a TPU-native ViT inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
OpenCL project ``Cappucciyes/ViT-With-OpenCL`` (see SURVEY.md): reference
weight/input binary formats, a pure fp32 golden model mirroring ``ViT_seq.c``,
a jit-compiled bf16 TPU engine with fused Pallas kernels, data/tensor-parallel
sharding over a device mesh, and the reference's golden-file parity harness.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    CLIP_VIT_B_16,
    DEIT_B_16_224,
    PRESETS,
    VIT_B_16_224,
    VIT_L_16_384,
    VIT_TINY_16_224,
    ViTConfig,
    get_config,
)
