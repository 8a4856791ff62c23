"""Tensor-parallel sharding rules (GSPMD-style).

The KAN conv's grouped structure makes output-channel sharding natural —
each group/output block is independent until the next layer's contraction
(SURVEY.md §2.5).  We annotate parameter PartitionSpecs over the 'model'
mesh axis and let XLA's SPMD partitioner insert the collectives over ICI;
no hand-written communication.

Rules:
  * conv weights (*k, I, O) and linear weights (I, O): shard O over 'model'
    when divisible by the axis size;
  * 1-D params (biases, norm scales, PReLU alphas) replicate — they are
    tiny, and e.g. a (groups,) PReLU alpha must NOT be cut over 'model';
  * everything else replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(x, model_size: int, min_dim: int = 2) -> P:
    if x.ndim >= 2 and x.shape[-1] >= min_dim and x.shape[-1] % model_size == 0:
        return P(*([None] * (x.ndim - 1)), "model")
    return P()


def make_stacked_axis_mesh(axis: str, size: int, data=None, devices=None):
    """A ('data', <axis>) mesh — shared builder behind
    pipeline.make_pipeline_mesh and moe.make_expert_mesh: batch shards
    over 'data', the stacked leading param axis over `axis`."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % size == 0, f"{n} devices not divisible by {axis}={size}"
        data = n // size
    assert data * size == n, f"{data}x{size} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, size), ("data", axis))


def stacked_state_shardings(tree, mesh: Mesh, axis: str, path_key: str):
    """NamedSharding pytree for any pytree (params, optimizer state, a
    whole TrainState): every leaf on a path through `path_key` shards its
    leading stacked axis over `axis` (optimizer moments and EMA mirrors
    share the param paths, so they shard identically); everything else
    replicates.  Shared walk behind pipeline.pipeline_state_shardings
    ('stages'/'pipe') and moe.expert_state_shardings ('experts'/
    'expert')."""
    width = mesh.shape[axis]

    def spec(path, x):
        on_key = any(
            getattr(k, "key", getattr(k, "name", None)) == path_key
            for k in path)
        if (on_key and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] % width == 0):
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)


def param_partition_specs(params, mesh: Mesh, min_dim: int = 2):
    """PartitionSpec pytree for a params tree: output-channel TP."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    if model_size <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map(
        lambda x: _spec_for(x, model_size, min_dim), params)


def shard_params(params, mesh: Mesh, min_dim: int = 2):
    """Device-put a params tree with TP shardings."""
    specs = param_partition_specs(params, mesh, min_dim)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def _zero1_spec(x, data_size: int, model_size: int, min_dim: int) -> P:
    """ZeRO-1 PartitionSpec for an optimizer-moment leaf: the largest
    dimension divisible by the 'data' axis size carries 'data' (the TP
    'model' rule stays on the last dim when it applies, so ZeRO-1 composes
    with tensor parallelism).  Leaves with no divisible dim replicate."""
    if not hasattr(x, "ndim") or x.ndim == 0:
        return P()
    spec = [None] * x.ndim
    if (model_size > 1 and x.ndim >= 2 and x.shape[-1] >= min_dim
            and x.shape[-1] % model_size == 0):
        spec[-1] = "model"
    for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
        if spec[d] is None and x.shape[d] and x.shape[d] % data_size == 0:
            spec[d] = "data"
            break
    return P(*spec)


def state_shardings(state, mesh: Mesh, min_dim: int = 2,
                    zero1: bool = False, fsdp: bool = False):
    """NamedSharding pytree matching a TrainState: params + opt_state get
    the TP rules (optimizer moments share the param shapes), scalars and
    batch stats replicate.

    zero1=True additionally distributes the optimizer state (AdamW m/v
    moments) over the 'data' axis — ZeRO-1: each data-parallel shard
    stores 1/N of the moments, computes 1/N of the parameter update, and
    XLA's SPMD partitioner inserts the reduce-scatter/all-gather pair
    (gradients are consumed sharded, updated params are re-gathered to the
    replicated spec).  Params/EMA stay whole — per-device optimizer memory
    drops ~2x param bytes at N>=2 with no change to the math.  Built for
    single-controller runs (the checkpoint snapshot path assumes fully
    addressable arrays); multi-process ZeRO-1 is out of scope.

    fsdp=True shards the PARAMS (and their EMA mirrors) over 'data' as
    well, with the same largest-divisible-dim rule — the GSPMD form of
    fully-sharded data parallelism (ZeRO-3): each shard stores 1/N of
    params + moments + EMA, XLA's SPMD partitioner all-gathers each weight
    at its use sites in forward/backward and reduce-scatters its gradient,
    and the optimizer update runs on the local shard.  Implies the zero1
    moment distribution (moments shard with their params); composes with
    the TP 'model' rule (the last dim keeps 'model' when it applies, so a
    weight can be cut over BOTH axes).  The math is unchanged — parity
    tests hold at the usual f32 reduction tolerance."""
    def to_sharding(spec_tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), spec_tree,
            is_leaf=lambda s: isinstance(s, P))

    repl = NamedSharding(mesh, P())
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    model_size = sizes.get("model", 1)
    data_size = sizes.get("data", 1)

    if fsdp and data_size > 1:
        p_specs = jax.tree_util.tree_map(
            lambda x: _zero1_spec(x, data_size, model_size, min_dim),
            state.params)
    else:
        p_specs = param_partition_specs(state.params, mesh, min_dim)

    def opt_spec(x):
        if (zero1 or fsdp) and data_size > 1 and hasattr(x, "ndim"):
            return _zero1_spec(x, data_size, model_size, min_dim)
        # same model_size<=1 guard as param_partition_specs: on a mesh
        # without a 'model' axis, P(..., 'model') would crash NamedSharding
        if model_size <= 1 or not hasattr(x, "ndim"):
            return P()
        return _spec_for(x, model_size, min_dim)

    return state.replace(
        step=repl,
        params=to_sharding(p_specs),
        opt_state=jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, opt_spec(x)), state.opt_state),
        batch_stats=jax.tree_util.tree_map(lambda _: repl, state.batch_stats),
        # the EMA tree mirrors params, so it shards with the same rules
        ema_params=(to_sharding(p_specs)
                    if getattr(state, "ema_params", None) is not None
                    else None),
    )
