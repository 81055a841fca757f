"""Pallas kernel layer — TPU-native equivalents of the reference's device
kernels (SURVEY.md §2.2):

| reference kernel (OpenCL)        | TPU-native op                          |
|----------------------------------|----------------------------------------|
| conv2d_kernel + postprocess      | models/vit.embed (patchify + MXU GEMM, |
|                                  | XLA-fused epilogue)                    |
| ll.cl linear_layer (+GELU)       | ops/linear.fused_linear                |
| multihead.cl QKV                 | fused [D,3D] GEMM (models/vit)         |
| multihead.cl QKV_TO_SCOREV       | ops/attention.flash_attention          |
| layer_norm.cl layerNorm          | ops/layernorm.layer_norm               |
| layer_norm.cl encoderResidual    | ops/layernorm.residual_layer_norm      |
| miniSoftMax.cl softMax           | ops/softmax.softmax                    |
"""

from .attention import flash_attention, flash_attention_interpret  # noqa: F401
from .layernorm import layer_norm, residual_layer_norm  # noqa: F401
from .linear import fused_linear  # noqa: F401
from .softmax import softmax  # noqa: F401
