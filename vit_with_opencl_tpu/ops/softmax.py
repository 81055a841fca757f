"""Numerically-stable softmax, kept as a named op for parity testing.

The reference dedicates a kernel to this — a single 1024-lane workgroup doing
max-reduce, exp, sum-reduce, divide over the 1000 class logits
(reference: miniSoftMax.cl:1-50), capping num_classes at 1024. On TPU this is
exactly ``jax.nn.softmax`` (an XLA fusion, no class-count cap); it exists as
a module so the §2.2 kernel inventory maps one-to-one and tests can target it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Stable softmax in fp32, result cast back to the input dtype."""
    out = jax.nn.softmax(logits.astype(jnp.float32), axis=axis)
    return out.astype(logits.dtype)
