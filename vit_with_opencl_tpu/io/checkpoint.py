"""Framework-native checkpoints (Orbax) alongside the reference format.

The reference's only checkpoint format is its directory of per-tensor
raw-fp32 files (io/binfmt — kept as the interchange format). For framework-
native use — sharded params, bf16/int8 dtypes, fast reload of the stacked
pytree — Orbax is the right tool: it round-trips arbitrary pytrees with
their shardings and scales to multi-host.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str | os.PathLike, params: Dict[str, Any]) -> None:
    """Save a (stacked or quantized) param pytree to an Orbax checkpoint."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def checkpoint_structure(path: str | os.PathLike) -> Optional[Dict[str, Any]]:
    """The saved pytree's structure (a nested dict with metadata leaves),
    or None if the metadata cannot be read (older orbax layouts, foreign
    checkpoints).

    Lets callers adapt their restore template to what the checkpoint
    actually contains — e.g. a Trainer resuming across an EMA or
    grad-clip setting change, where the opt_state/ema_params presence
    differs from the current run's — instead of guessing via retry.
    """
    import orbax.checkpoint as ocp

    try:
        md = ocp.StandardCheckpointer().metadata(os.path.abspath(path))
        tree = getattr(md, "item_metadata", md)
        tree = getattr(tree, "tree", tree)
        return tree if isinstance(tree, dict) else None
    except Exception:
        return None


def load_checkpoint(
    path: str | os.PathLike,
    like: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Load an Orbax checkpoint.

    ``like`` (an abstract/example pytree) restores with matching structure,
    dtypes and shardings; without it the checkpoint's stored structure is
    used (arrays restore to host/default device).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), x.dtype, sharding=getattr(x, "sharding", None)
            )
            if hasattr(x, "dtype") else x,
            like,
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
