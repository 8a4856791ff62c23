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

Homogeneous stages are the structural requirement of STACKED-parameter
pipelining; in this framework that is the deep KAN-MLP trunk (every
hidden→hidden layer of a `KanMLP` has identical shapes — nn/mlp.py),
exposed as `PipelinedKanMLP`.  The CNN zoo's stages are heterogeneous
(channel counts change every block); those pipeline through
`gpipe_hetero_apply` (round 4): activations travel flattened+padded to
the largest stage boundary, each device picks its stage with
`lax.switch` on its pipe rank, and a custom VJP runs the reverse
schedule with per-stage recompute (models/vgg.PipelinedVGGKAN is the
zoo integration — `--mesh_pipe` with `--model VGGKAN`).

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


# --------------------------------------------------- heterogeneous stages
def gpipe_hetero_apply(stage_fns, params, keys, x, *, mesh: Mesh,
                       in_shapes, out_shape, pipe_axis: str = "pipe",
                       n_microbatches: int = 0):
    """GPipe over HETEROGENEOUS stages (round 4, VERDICT r3 #5): stage i
    maps (mb, *in_shapes[i]) -> (mb, *in_shapes[i+1]) (the last to
    (mb, *out_shape)), with arbitrary per-stage parameter pytrees.

    Stacked-scan pipelining needs one uniform-shape carry, so activations
    travel flattened and zero-padded to the largest boundary size; each
    device picks its stage with `lax.switch(axis_index)` (every branch is
    compiled once — SPMD requires a single program anyway) and params are
    passed replicated.  Requires len(stage_fns) == mesh pipe size (one
    stage per pipe rank).

    stage_fns[i](params_i, key, h) -> h'; `keys` is a per-stage PRNG key
    array (S, 2) for in-stage dropout, folded with the microbatch index so
    the pattern is a pure function of (stage, microbatch).
    Differentiable end-to-end: ppermute transposes to the reverse shift,
    and the stage dispatch carries a custom VJP (see the body comment —
    plain switch autodiff cannot unify heterogeneous branch residuals)."""
    import numpy as np

    pipe = mesh.shape[pipe_axis]
    S = len(stage_fns)
    assert S == pipe, (
        f"{S} stages need a {S}-wide '{pipe_axis}' mesh axis (got {pipe})")
    m = n_microbatches or pipe
    bspec = batch_axes(mesh)

    in_sizes = [int(np.prod(s)) for s in in_shapes]
    out_size = int(np.prod(out_shape))
    C = max(in_sizes + [out_size])

    def local(params, keys, xl):
        idx = jax.lax.axis_index(pipe_axis)
        b = xl.shape[0]
        assert b % m == 0, (
            f"per-shard batch {b} not divisible by n_microbatches={m}")
        mb = b // m
        xf = xl.reshape(m, mb, -1)
        xm = jnp.pad(xf, ((0, 0), (0, 0), (0, C - xf.shape[-1])))

        def run_stage(i, params, keys, h, t):
            hi = h[:, :in_sizes[i]].reshape((mb,) + tuple(in_shapes[i]))
            key = jax.random.fold_in(keys[i], t - i)  # microbatch id
            y = stage_fns[i](params[i], key, hi).reshape(mb, -1)
            return jnp.pad(y, ((0, 0), (0, C - y.shape[-1])))

        # The stage dispatch needs a custom VJP: autodiff's partial-eval
        # of `lax.switch` requires every branch to stage out IDENTICAL
        # residual avals, which heterogeneous stages cannot (each saves
        # different activation shapes).  Here the forward switch saves
        # only (params, keys, h, t) — uniform by construction — and the
        # backward is ITSELF a switch of per-stage VJPs, each returning
        # the FULL dparams pytree (its own stage's cotangent, zeros
        # elsewhere) so branch out_avals match.  Stage forwards are
        # recomputed in backward — the standard GPipe remat tradeoff.
        # Everything is passed explicitly (no closed-over tracers inside
        # the custom_vjp), and integer args get float0 cotangents.
        import numpy as _np

        from jax.dtypes import float0

        def _f0(x):
            return _np.zeros(jnp.shape(x), float0)

        @jax.custom_vjp
        def apply_stage(params, keys, idx, h, t):
            return jax.lax.switch(
                idx, [(lambda h, t, i=i: run_stage(i, params, keys, h, t))
                      for i in range(S)], h, t)

        def _fwd(params, keys, idx, h, t):
            return apply_stage(params, keys, idx, h, t), \
                (params, keys, idx, h, t)

        def _bwd(res, dy):
            params, keys, idx, h, t = res

            def bwd_branch(i):
                def f(dy):
                    def fwd_i(p_i, hh):
                        sub = tuple(p_i if j == i else params[j]
                                    for j in range(S))
                        return run_stage(i, sub, keys, hh, t)

                    _, vjp = jax.vjp(fwd_i, params[i], h)
                    dp_i, dh = vjp(dy)
                    dparams = tuple(
                        dp_i if j == i else jax.tree_util.tree_map(
                            jnp.zeros_like, params[j]) for j in range(S))
                    return dparams, dh
                return f

            dparams, dh = jax.lax.switch(
                idx, [bwd_branch(i) for i in range(S)], dy)
            return dparams, _f0(keys), _f0(idx), dh, _f0(t)

        apply_stage.defvjp(_fwd, _bwd)

        def tick(state, t):
            inj = xm[jnp.clip(t, 0, m - 1)]
            h = jnp.where(idx == 0, inj, state)
            y = apply_stage(params, keys, idx, h, t)
            out = jnp.where(idx == pipe - 1, y, jnp.zeros_like(y))
            if pipe > 1:
                y = jax.lax.ppermute(
                    y, pipe_axis, [(i, i + 1) for i in range(pipe - 1)])
            return y, out

        init = jnp.zeros((mb, C), xl.dtype)
        _, outs = jax.lax.scan(tick, init, jnp.arange(m + pipe - 1))
        y = jax.lax.psum(outs[pipe - 1:], pipe_axis)
        return y[:, :, :out_size].reshape((b,) + tuple(out_shape))

    x_spec = P(bspec if bspec else None, *([None] * (x.ndim - 1)))
    out_spec = P(bspec if bspec else None,
                 *([None] * len(tuple(out_shape))))
    # check_vma=False: the custom-VJP stage dispatch returns per-branch
    # param cotangents whose varying-axes typing the vma checker cannot
    # unify with the transposed scan's accumulator (mixed zero/live
    # slots); the replicated-input psum transpose is unaffected.
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), x_spec), out_specs=out_spec,
        check_vma=False,
    )(params, keys, x)
