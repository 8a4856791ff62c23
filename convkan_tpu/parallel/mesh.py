"""Device-mesh and sharding utilities.

The reference is single-device (SURVEY.md §2.5: no torch.distributed
anywhere); every parallel axis here is a new TPU-first component.  We expose
a thin, explicit layer over jax.sharding: a named Mesh ('data', 'model'),
NamedSharding builders, and helpers to shard batches over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model'[, 'spatial']) mesh.  Defaults to all
    devices on the data axis — the primary axis for this CNN-classifier
    workload.  spatial > 1 appends a 'spatial' axis for halo-sharded
    image planes (parallel/halo.py): `data_sharding` then also shards the
    H dim of image batches over it, and `set_spatial_defaults(mesh,
    'spatial')` makes every conv in a factory-built model halo-exchange."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (model * spatial) == 0
        data = n // (model * spatial)
    assert data >= 1 and model >= 1 and spatial >= 1, (
        f"empty mesh: {data}x{model}x{spatial}")
    assert data * model * spatial == n, (
        f"{data}x{model}x{spatial} != {n} devices")
    if spatial == 1:
        arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, ("data", "model"))
    arr = np.asarray(devices).reshape(data, model, spatial)
    return Mesh(arr, ("data", "model", "spatial"))


def make_multislice_mesh(data_per_slice: Optional[int] = None,
                         model: int = 1, n_slices: Optional[int] = None,
                         devices: Optional[Sequence] = None) -> Mesh:
    """Multi-slice mesh: a leading 'dcn' axis across slices (gradient
    all-reduce rides DCN), 'data'/'model' within a slice (ICI).

    Requires jax.distributed.initialize() on multi-host deployments; uses
    mesh_utils' hybrid mesh so ICI-contiguous devices stay within the inner
    axes.  Single-slice environments fall back to make_mesh.

    `devices`: explicit flat device list treated as `n_slices` contiguous
    pseudo-slices — the test/emulation hook for environments whose devices
    carry no slice_index (virtual CPU meshes); production multislice runs
    leave it None and take the hybrid-mesh path.  Both paths share the
    (dcn*data, model) -> (dcn, data, model) reshape.
    """
    import jax.experimental.mesh_utils as mesh_utils

    if devices is not None and (n_slices or 1) > 1:
        per_slice = len(devices) // n_slices
        data_per_slice = data_per_slice or per_slice // model
        dev = np.asarray(list(devices)).reshape(
            n_slices * data_per_slice, model)
    else:
        if n_slices is None:
            # jax Devices expose slice_index (not a slice *count*) — derive
            # the count from the distinct indices; a nonexistent-attr
            # getattr default here would silently disable the hybrid path
            # on every real multislice deployment
            idx = {getattr(d, "slice_index", 0) or 0 for d in jax.devices()}
            n_slices = len(idx)
        if n_slices <= 1:
            m = make_mesh(data=data_per_slice, model=model, devices=devices)
            arr = m.devices.reshape((1,) + m.devices.shape)
            return Mesh(arr, ("dcn",) + m.axis_names)
        per_slice = len(jax.devices()) // n_slices
        data_per_slice = data_per_slice or per_slice // model
        dev = mesh_utils.create_hybrid_device_mesh(
            (data_per_slice, model), (n_slices, 1))
    # hybrid mesh returns (dcn*data, model); reshape to (dcn, data, model)
    arr = dev.reshape(n_slices, data_per_slice, model)
    return Mesh(arr, ("dcn", "data", "model"))


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over ('dcn' first when a
    multi-slice axis exists)."""
    return tuple(ax for ax in ("dcn", "data") if ax in mesh.axis_names)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axes; image batches
    (ndim >= 3) additionally shard H over a 'spatial' axis when the mesh
    has one; replicate the rest."""
    spec = [batch_axes(mesh)] + [None] * (ndim - 1)
    if ndim >= 3 and "spatial" in mesh.axis_names:
        spec[1] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with batch-axis sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch
    )
