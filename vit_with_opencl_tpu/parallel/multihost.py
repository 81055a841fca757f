"""Multi-host entry point: DCN-aware initialization and mesh construction.

Single-host meshes (spmd.make_mesh) lay every axis over ICI. Across hosts,
the data-center network (DCN) is orders of magnitude slower than ICI, so the
mesh must be layered: replicate-heavy axes (data parallelism) across DCN,
communication-heavy axes (tensor parallelism) within a host's ICI domain.
This module wraps the standard JAX multi-process bootstrap and builds such a
hybrid mesh. The reference has no distribution story at all (single GPU,
ViT_opencl.c:803); this is the scale-out layer.

Environment fallbacks follow the usual TPU pod conventions: explicit
arguments > JAX_COORDINATOR_ADDRESS/PROCESS_COUNT/PROCESS_ID env vars >
jax.distributed's own auto-detection on TPU pods.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process runtime (no-op when single-process).

    On TPU pods jax.distributed can auto-detect everything; args/env vars
    override for manual (e.g. DCN between separate pod slices) setups.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_PROCESS_COUNT" in os.environ:
        num_processes = int(os.environ["JAX_PROCESS_COUNT"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection: jax.distributed can discover the cluster
        # itself. Outside a cluster (single process, no detectable env) it
        # raises — which is the no-op case, not an error.
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """A ("data", "model") mesh layered DCN x ICI.

    The "model" (tensor-parallel) axis is kept inside each host's ICI domain;
    "data" spans hosts over DCN (data parallelism needs no per-step
    communication at inference, and only gradient all-reduces in training —
    the DCN-tolerant traffic pattern). ``data`` defaults to
    total_devices / model.
    """
    total = jax.device_count()
    local = jax.local_device_count()
    if model > local:
        raise ValueError(
            f"model axis {model} exceeds local (ICI) device count {local}; "
            "tensor parallelism must not cross DCN"
        )
    if local % model:
        raise ValueError(f"model axis {model} must divide local devices {local}")
    if data is None:
        data = total // model
    if data * model != total:
        raise ValueError(
            f"data*model = {data * model} != total devices {total}"
        )
    if jax.process_count() == 1:
        devices = np.asarray(jax.devices()).reshape(data, model)
        return Mesh(devices, axis_names=("data", "model"))
    from jax.experimental import mesh_utils

    # DCN axis first (data over hosts), ICI axes within a host.
    per_host_data = data // jax.process_count()
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_host_data, model),
        dcn_mesh_shape=(jax.process_count(), 1),
    )
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))
