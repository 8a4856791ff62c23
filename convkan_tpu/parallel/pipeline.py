"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

The reference is single-device (SURVEY.md §2.5) — like everything under
`parallel/`, this is a new TPU-first component.  It implements the
canonical TPU pipelining recipe (scaling-book "pipelining" pattern):

* the parameters of S **identical** stages are stacked along a leading
  stage axis and sharded over the `pipe` mesh axis (each device holds
  S/pipe consecutive stages);
* the global batch is split into M microbatches and the schedule runs as
  ONE `lax.scan` over M + pipe - 1 ticks inside `jax.shard_map`: every
  tick each device applies its stage fold to its in-flight microbatch,
  then `ppermute`s the activation to the next stage over ICI;
* stage 0 injects a fresh microbatch per tick, the last stage emits one —
  the classic GPipe bubble of (pipe-1)/(M+pipe-1) idle ticks;
* backward runs the reverse schedule automatically: `jax.grad` through
  `shard_map` transposes each `ppermute` into the opposite shift, so the
  gradient pipeline needs no hand-written code.

Homogeneous stages are the structural requirement of stacked-parameter
pipelining; in this framework that is the deep KAN-MLP trunk (every
hidden→hidden layer of a `KanMLP` has identical shapes — nn/mlp.py),
exposed as `PipelinedKanMLP`.  The CNN zoo's stages are heterogeneous
(channel counts change every block), so those models scale with the
data/model/spatial axes instead (docs/ARCHITECTURE.md).

Composes with data parallelism: on a ('data', 'pipe') mesh the batch
shards over 'data' as usual (`mesh.data_sharding` replicates over 'pipe')
and every pipe group pipelines its local shard.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import batch_axes


def make_pipeline_mesh(pipe: int, data: Optional[int] = None,
                       devices: Optional[Sequence] = None) -> Mesh:
    """A ('data', 'pipe') mesh: batch over 'data', stages over 'pipe'."""
    from .sharding import make_stacked_axis_mesh

    return make_stacked_axis_mesh("pipe", pipe, data=data, devices=devices)


def gpipe_apply(stage_fn, stacked_params, x, *, mesh: Mesh,
                pipe_axis: str = "pipe", n_microbatches: int = 0):
    """Run `x` through S stacked stages, pipelined over `pipe_axis`.

    stage_fn(params_i, h) -> h' must preserve h's shape and dtype (the
    homogeneity pipelining requires).  `stacked_params` is any pytree
    whose leaves carry a leading stage axis of size S, with S divisible
    by the mesh's pipe size; consecutive stages fold onto one device when
    S > pipe.  `x` is the (global) activation batch, batch-dim first.

    Differentiable end-to-end: use inside a loss under `jax.grad`."""
    leaves = jax.tree_util.tree_leaves(stacked_params)
    assert leaves, "stacked_params is empty"
    n_stages = leaves[0].shape[0]
    pipe = mesh.shape[pipe_axis]
    assert n_stages % pipe == 0, (
        f"{n_stages} stages not divisible by pipe={pipe}")
    m = n_microbatches or pipe
    bspec = batch_axes(mesh)

    def local(params, xl):
        idx = jax.lax.axis_index(pipe_axis)
        b = xl.shape[0]
        assert b % m == 0, (
            f"per-shard batch {b} not divisible by n_microbatches={m}")
        xm = xl.reshape(m, b // m, *xl.shape[1:])

        def fold(h):
            # consecutive stages resident on this device (S // pipe of them)
            h, _ = jax.lax.scan(lambda c, p: (stage_fn(p, c), None),
                                h, params)
            return h

        def tick(state, t):
            # stage 0 injects microbatch t (clipped: ticks >= m feed a
            # repeat whose output never reaches the last stage in time)
            inj = xm[jnp.clip(t, 0, m - 1)]
            state = jnp.where(idx == 0, inj, state)
            y = fold(state)
            out = jnp.where(idx == pipe - 1, y, jnp.zeros_like(y))
            if pipe > 1:
                y = jax.lax.ppermute(
                    y, pipe_axis, [(i, i + 1) for i in range(pipe - 1)])
            return y, out

        init = jnp.zeros((b // m, *xl.shape[1:]), xl.dtype)
        # the carry varies over every mesh axis inside shard_map; mark the
        # all-zero init as varying too so the scan carry types match
        init = jax.lax.pcast(init, tuple(mesh.axis_names), to="varying")
        _, outs = jax.lax.scan(tick, init, jnp.arange(m + pipe - 1))
        # outs[pipe-1:] are microbatches 0..m-1, nonzero only on the last
        # stage; psum replicates them to the whole pipe group
        y = jax.lax.psum(outs[pipe - 1:], pipe_axis)
        return y.reshape(b, *xl.shape[1:])

    x_spec = P(bspec if bspec else None, *([None] * (x.ndim - 1)))
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(pipe_axis), x_spec), out_specs=x_spec,
    )(stacked_params, x)


def pipeline_state_shardings(tree, mesh: Mesh, pipe_axis: str = "pipe"):
    """NamedSharding pytree for a TrainState (or any pytree) holding a
    PipelinedKanMLP: every leaf on a path through a 'stages' key shards
    its leading stage axis over `pipe_axis` (params AND the optimizer
    moments, which mirror the param paths); everything else replicates."""
    from .sharding import stacked_state_shardings

    return stacked_state_shardings(tree, mesh, pipe_axis, "stages")


class PipelinedKanMLP(nn.Module):
    """A deep KAN MLP whose hidden→hidden trunk is stacked for pipeline
    parallelism: embed (in_dim→hidden) and head (hidden→out_dim) are
    ordinary replicated layers; the `n_stages` identical hidden layers
    live as one stacked 'stages' param whose leading axis shards over the
    mesh's `pipe` axis.

    With `mesh=None` (or a 1-wide pipe axis) the trunk runs as a plain
    sequential `lax.scan` — numerically identical to the pipelined run,
    which the tests assert.  Families are the `MLP_KAN_FACTORY` keys
    (models/kans.py:556-574 vocabulary via nn/mlp._build_layer)."""

    family: str
    in_dim: int
    hidden: int
    n_stages: int
    out_dim: int
    cfg: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    mesh: Optional[Mesh] = None
    pipe_axis: str = "pipe"
    n_microbatches: int = 0  # 0 -> the mesh's pipe size

    @property
    def model_name(self) -> str:
        # the reference's `model.name` checkpoint-naming contract
        return (f"PipelinedKanMLP_{self.family.upper()}"
                f"_s{self.n_stages}_h{self.hidden}")

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..nn.mlp import _build_layer

        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        x = _build_layer(self.family, self.in_dim, self.hidden,
                         self.cfg)(x, train=train)

        stage = _build_layer(self.family, self.hidden, self.hidden, self.cfg)

        def init_stages(rng):
            keys = jax.random.split(rng, self.n_stages)
            dummy = jnp.zeros((1, self.hidden), jnp.float32)
            return jax.vmap(
                lambda k: stage.init(k, dummy, train=False)["params"])(keys)

        stacked = self.param("stages", init_stages)

        def stage_fn(p, h):
            # KAN linear layers are dropout-free (nn/mlp.py puts dropout
            # between layers, not inside), so train=False is exact
            return stage.apply({"params": p}, h, train=False)

        pipelined = (self.mesh is not None
                     and self.mesh.shape.get(self.pipe_axis, 1) > 1)
        if pipelined:
            x = gpipe_apply(stage_fn, stacked, x, mesh=self.mesh,
                            pipe_axis=self.pipe_axis,
                            n_microbatches=self.n_microbatches)
        else:
            x, _ = jax.lax.scan(lambda c, p: (stage_fn(p, c), None),
                                x, stacked)
        return _build_layer(self.family, self.hidden, self.out_dim,
                            self.cfg)(x, train=train)
