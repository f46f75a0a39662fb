"""Multi-host (pod / multi-slice) glue: process init + hybrid DCN×ICI mesh.

The north-star (BASELINE.json) demands ">=85% tokens/s scaling efficiency
from 1 host to N>=2 hosts". The kernels and collectives in this package are
mesh-agnostic; what a pod run additionally needs is (a) per-process runtime
initialization and (b) a mesh whose axes are laid out so that
bandwidth-hungry collectives ride ICI within a slice while only the
data-parallel gradient psum crosses DCN — exactly the layout
`make_pod_mesh` builds:

    data axis  = (DCN replicas) x (ICI data groups)   — outermost over DCN
    model axis = ICI only (head-TP psum per layer)
    context axis = ICI only (ring ppermute per kv hop)

On a dev box (single process, emulated devices) `make_pod_mesh` degrades to
the plain single-slice mesh, so the same launch script runs everywhere.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime for a multi-host run.

    With no arguments, relies on the TPU pod launcher's environment
    (the standard `jax.distributed.initialize()` auto-detection). No-op if
    the runtime is already initialized. Must run before any JAX computation
    touches a backend — probing jax.devices()/process_count() here would
    lock in a local-only runtime, so the check uses
    jax.distributed.is_initialized() only.
    """
    if jax.distributed.is_initialized():
        return  # already initialized (by the launcher or a prior call)
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (ValueError, RuntimeError):
        if explicit:
            # a typo'd coordinator or late call must not silently degrade
            # into N independent single-host runs
            raise
        # auto-detection found no cluster: single-process run


def make_pod_mesh(
    data_dcn: int = 1,
    data: int = 1,
    model: int = 1,
    context: int = 1,
) -> Mesh:
    """Mesh('data', 'model', 'context') with DCN replicas outermost on data.

    data_dcn: slices (hosts groups) combined over DCN — pure data
    parallelism across them (gradient psum is the only DCN traffic).
    data/model/context: the within-slice ICI factorization, same semantics
    as make_attention_mesh. Requires data_dcn * data * model * context ==
    len(jax.devices()).
    """
    n = data_dcn * data * model * context
    devices = jax.devices()
    if n != len(devices):
        raise ValueError(f"mesh {data_dcn}x{data}x{model}x{context}={n} != {len(devices)} devices")
    if data_dcn > 1 and hasattr(devices[0], "slice_index"):
        # real pod slices: lay DCN replicas outermost so only the gradient
        # psum crosses DCN
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data, model, context),
            dcn_mesh_shape=(data_dcn, 1, 1),
        )
    elif data_dcn > 1:
        # no slice topology (single process / emulated devices): the DCN
        # grouping degenerates to plain data parallelism — contiguous device
        # blocks stand in for slices so the same script stays runnable in CI
        dev_array = np.asarray(devices).reshape(data_dcn, data, model, context)
    else:
        dev_array = np.asarray(devices).reshape(data, model, context)
    return Mesh(dev_array.reshape(data_dcn * data, model, context),
                ("data", "model", "context"))
