"""Numerics debugging helpers.

The reference carries a host-side NaN scanner, ``findNaN(buf, tokens, dims)``
(reference: ViT_opencl.c:1050-1061), with call sites commented out through the
encoder (:720,726,734,961). These are the working equivalents:

  * ``find_nan``: scan any pytree for non-finite values, reporting which leaf
    and how many;
  * ``checked_forward``: wrap a forward fn so every call asserts finite
    outputs (device-side check, one scalar readback);
  * ``jax.debug_nans`` note: for tracing the *origin* of a NaN, prefer
    ``jax.config.update("jax_debug_nans", True)`` — it re-runs the offending
    primitive un-jitted and points at it.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_nan(tree: Any, name: str = "tree") -> List[Tuple[str, int, int]]:
    """Scan a pytree for non-finite values.

    Returns [(leaf_path, nan_count, inf_count)] for offending leaves only
    (empty list = clean). Pulls data to host — debugging tool, not a hot-path
    check (use ``checked_forward`` for that).
    """
    out = []
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        nan = int(np.isnan(arr).sum())
        inf = int(np.isinf(arr).sum())
        if nan or inf:
            out.append((name + jax.tree_util.keystr(path), nan, inf))
    return out


def checked_forward(fn: Callable, what: str = "forward") -> Callable:
    """Wrap a forward fn with a device-side finiteness check.

    The check is computed on device (one extra scalar), fetched per call;
    raises FloatingPointError with the non-finite count on failure — the
    always-on production equivalent of the reference's commented-out
    findNaN call sites.
    """

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        bad = jax.tree_util.tree_reduce(
            lambda acc, leaf: acc
            + (jnp.size(leaf) - jnp.isfinite(leaf).sum()
               if jnp.issubdtype(leaf.dtype, jnp.floating) else 0),
            out,
            jnp.int32(0),
        )
        bad_count = int(bad)
        if bad_count:
            raise FloatingPointError(
                f"{what}: {bad_count} non-finite output values"
            )
        return out

    return wrapped
