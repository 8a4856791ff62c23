"""WavKAN convolutions for TPU.

The reference ships three wavelet-conv engines (layers/wav_kan_layers.py):
  * 'base'          — out_dim separate (in->1) convs + 1x1 mix (:113-218)
  * 'fast'          — one grouped conv over flattened (out*in) channels
                      (:285-338)
  * 'fast_plus_one' — a (d+1)-dim conv whose extra kernel dim spans the
                      input channels (:221-282)

All three compute the SAME contraction
    y[b, o] = sum_i  K_{o,i} (*) psi((x[b, i] - t[o,i]) / s[o,i])
with identical init distributions (kaiming_uniform 'linear', fan_in =
in_g * prod(k)) — they differ only in torch parameter bookkeeping.  We
implement the one true math as a single grouped XLA conv with
feature_group_count = groups * out_g and keep `wav_version` for API/
checkpoint parity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..basis.wavelet import WAVELET_TYPES, wavelet
from ..ops.conv import conv_nd
from ..utils import initializers as init_lib
from ..utils.norms import BatchNorm, make_norm
from ..parallel.halo import maybe_sharded_conv, resolve_spatial
from .kan_conv import _PERF_DEFAULTS

# process-wide default for WavKANConvND.psi_build (see that flag's
# docstring); toggled via set_wav_perf_defaults so bench A/Bs are not
# silently no-ops (flax dataclass defaults bake at class creation)
_WAV_PERF_DEFAULTS = {"psi_build": "bcast", "psi_remat": False}


def set_wav_perf_defaults(**kwargs):
    """Set process-wide defaults for WavKANConvND's perf-only knobs
    (currently psi_build: 'bcast' | 'flat').  Returns the previous
    values so callers can restore them."""
    prev = {}
    for k, v in kwargs.items():
        if k not in _WAV_PERF_DEFAULTS:
            raise KeyError(f"unknown wav perf knob {k!r}; "
                           f"have {sorted(_WAV_PERF_DEFAULTS)}")
        prev[k] = _WAV_PERF_DEFAULTS[k]
        _WAV_PERF_DEFAULTS[k] = v
    return prev


class WavKANConvND(nn.Module):
    """WavKAN conv layer (channel-last).  Reference:
    layers/wav_kan_layers.py:341-456 (+ engines above)."""

    input_dim: int
    output_dim: int
    kernel_size: Union[int, Tuple[int, ...]]
    ndim: int = 2
    groups: int = 1
    padding: Union[int, Tuple[int, ...]] = 0
    stride: Union[int, Tuple[int, ...]] = 1
    dilation: Union[int, Tuple[int, ...]] = 1
    dropout: float = 0.0
    wavelet_type: str = "mexican_hat"
    wav_version: str = "fast"
    norm_layer: Any = BatchNorm
    norm_kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    param_dtype: Any = jnp.float32
    # False | 'auto' | True — 'auto' means "the measured-fastest path",
    # which is the XLA path on every tested config (fused kernels reach
    # 8.2k vs XLA's 14.5k img/s on config 4 even lane-packed — the
    # wavelet's per-value arithmetic is ~20x a B-spline's, so VMEM
    # recompute loses to HBM materialization; KERNELS.md round 3).
    # True still forces the kernels (parity-tested).
    use_pallas: Any = "auto"
    pallas_interpret: bool = False
    # opt-in: run the psi->grouped-conv island natively in bf16 — cast the
    # NARROW pre-expansion input and (translation, scale, wavelet_w) to
    # bf16, so the wide (B,*S,G*out_g*in_g) psi tensor AND its autodiff
    # cotangent live in HBM as bf16.  psi materialization is this config's
    # dominant traffic, profiled at ~82% of the HBM roofline
    # (BENCH_NOTES.md config 4) — halving its bytes is the one lever XLA
    # cannot take itself.  Conv output is cast back to f32 before the 1x1
    # mix.  NOT torch-bit-exact; standard bf16 mixed precision.
    # None = the process default, shared with KanConvND
    # (kan_conv.set_perf_defaults(island_bf16=...)).
    island_bf16: Any = None
    # spatial sharding via halo exchange, same contract as
    # KanConvND.spatial_mesh/spatial_axis (parallel/halo.py): a Mesh plus
    # one mesh-axis name (first spatial dim) or an ndim-tuple of
    # names/None; ineligible configs fall back to the plain conv.  The
    # psi expansion is pointwise, so XLA SPMD keeps it local to each
    # shard; the 1x1 mix needs no halo.  None = the process default
    # (parallel.halo.set_spatial_defaults).
    spatial_mesh: Any = None
    spatial_axis: Any = None
    # psi assembly strategy (numerics-identical; perf only):
    #   'bcast' — rank-5 (B,*S,G,out_g,in_g) broadcast, collapsed by
    #             reshape.  The measured-fastest form on v5e: XLA fuses
    #             the whole expansion into the forward grouped convs
    #             (the trace shows conv fusions reading the NARROW x
    #             directly — psi never exists separately on the forward
    #             path for L2/L3 of config 4).
    #   'flat'  — assemble psi directly in the collapsed layout: channel-
    #             concat the input out_g times, subtract/divide flat (C,)
    #             translation/scale vectors, apply the wavelet on the flat
    #             array.  Measured SLOWER (14.4k vs 16.4k img/s, config 4
    #             b1024, round 4): XLA materializes the concat instead of
    #             fusing it.  Kept for chips where the tradeoff differs.
    # None = the process default (set_wav_perf_defaults), which is
    # 'bcast'.  Both builds are bitwise identical
    # (test_fused_wav.py::test_psi_build_parity).
    psi_build: Any = None
    # rematerialize psi on the backward pass via jax.checkpoint
    # (numerics-identical).  Theory: autodiff saves wide backward
    # intermediates that XLA relayout-copies (~4 ms/step of
    # {3,0,2,1}<->{0,3,2,1} copies of the (B,*S,2048/8192) tensors on
    # config 4 at b256); remat could let the wgrad fuse a recompute from
    # the narrow x instead.  MEASURED SLOWER (13.6k vs 16.3k img/s,
    # config 4 b1024, round 4): the checkpoint boundary breaks the
    # igrad/divide-reduce fusions and costs more than the copies it
    # removes.  Default False; kept as an opt-in for memory-bound cases
    # (it does shrink the saved-activation footprint).
    psi_remat: Any = None

    @property
    def _psi_build_mode(self) -> str:
        return (_WAV_PERF_DEFAULTS["psi_build"] if self.psi_build is None
                else self.psi_build)

    @property
    def _psi_remat_on(self) -> bool:
        return (_WAV_PERF_DEFAULTS["psi_remat"] if self.psi_remat is None
                else self.psi_remat)

    @property
    def _island_bf16_on(self) -> bool:
        return (_PERF_DEFAULTS["island_bf16"] if self.island_bf16 is None
                else self.island_bf16)

    @property
    def _spatial_mesh(self):
        return resolve_spatial(self.spatial_mesh, self.spatial_axis)[0]

    def _conv(self, x, w, **kw):
        """Plain conv, or halo-exchange conv when spatially sharded and
        eligible — same dispatch as KanConvND (parallel/halo.py)."""
        return maybe_sharded_conv(self.spatial_mesh, self.spatial_axis,
                                  x, w, ndim=self.ndim, **kw)

    @property
    def in_g(self):
        return self.input_dim // self.groups

    @property
    def out_g(self):
        return self.output_dim // self.groups

    def _maybe_fused_psi_conv(self, x, wav_w, translation, scale, kshape):
        """Fused Pallas psi-conv (kernels/fused_wav_conv.py), or None for
        the XLA psi-materialization path."""
        if not self.use_pallas:
            return None
        if self.use_pallas == "auto":
            # 'auto' = measured-fastest = the XLA path on every tested
            # config (KERNELS.md round 3); use_pallas=True still forces
            # the kernels (tests, future hardware)
            return None
        if self._island_bf16_on:
            # the fused kernel is f32-only; silently running it in f32
            # under island_bf16 would make flag combinations measure
            # different numerics — the island takes priority (XLA path)
            return None
        if self._spatial_mesh is not None:
            # spatially sharded inputs go through the halo-exchange conv
            # (parallel/halo.py), not a pallas_call on a global array
            return None
        from ..kernels import fused_wav_conv as fwc

        pad = self.padding
        if isinstance(pad, (tuple, list)):
            if len(set(pad)) != 1:
                return None
            pad = pad[0]
        if self.ndim != 2 or x.dtype != jnp.float32:
            return None
        B, H, W = x.shape[0], x.shape[1], x.shape[2]
        if not fwc.supported(self.ndim, self.stride, self.dilation,
                             self.groups, self.wavelet_type, B, H, W,
                             self.input_dim, self.output_dim,
                             kshape[0], kshape[-1], pad, pad):
            return None
        return fwc.fused_wav_conv2d(
            x, wav_w,
            translation.reshape(self.output_dim, self.input_dim),
            scale.reshape(self.output_dim, self.input_dim),
            wavelet_type=self.wavelet_type, padding=pad,
            interpret=self.pallas_interpret)

    def _flat_psi(self, xw, tw, sw):
        """psi assembled directly in the collapsed (B, *S, C) layout,
        C = groups*out_g*in_g, flat index c = (g*out_g + o)*in_g + i.
        Numerically identical to the rank-5 broadcast + reshape (pinned by
        test_fused_wav.py::test_psi_build_parity); avoids the lane-padded
        rank-5 intermediate and its relayout copies entirely.  The channel
        concat is an XLA input fusion — the repeated x is never
        materialized in HBM, only the flat psi is."""
        if self.groups == 1:
            blocks = [xw] * self.out_g
        else:
            blocks = [xw[..., g * self.in_g:(g + 1) * self.in_g]
                      for g in range(self.groups) for _ in range(self.out_g)]
        x_flat = jnp.concatenate(blocks, axis=-1) if len(blocks) > 1 \
            else blocks[0]
        t_flat = tw.reshape(-1)
        s_flat = sw.reshape(-1)
        x_scaled = (x_flat - t_flat) / s_flat
        if self.wavelet_type == "shannon":
            # shannon windows over the in_g axis (wav_kan_layers.py:180-
            # 190); in flat layout that is the hamming window tiled per
            # (g, o) block
            from ..basis.wavelet import _sinc, hamming_window
            win = jnp.asarray(
                jnp.tile(jnp.asarray(hamming_window(self.in_g)),
                         self.groups * self.out_g)).astype(x_scaled.dtype)
            return _sinc(x_scaled / math.pi) * win
        return wavelet(x_scaled, self.wavelet_type)

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.wavelet_type in WAVELET_TYPES, (
            f"Unsupported wavelet type: {self.wavelet_type}"
        )
        if self.input_dim % self.groups or self.output_dim % self.groups:
            # same loud contract as KanConvND — a silent in_g truncation
            # surfaces later as an opaque XLA conv shape error
            raise ValueError(
                f"input_dim={self.input_dim} / output_dim="
                f"{self.output_dim} must be divisible by groups="
                f"{self.groups}")
        assert x.shape[-1] == self.input_dim
        ks = self.kernel_size
        kshape = tuple(ks) if isinstance(ks, (tuple, list)) else (ks,) * self.ndim

        silu = jax.nn.silu

        # ---------------- base path: conv(SiLU(x)), pre-dropout x
        base_w = self.param(
            "base_w",
            init_lib.kaiming_uniform("linear", layout="conv_hwio"),
            kshape + (self.in_g, self.output_dim),
            self.param_dtype,
        )
        base_out = self._conv(
            silu(x), base_w, stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
        )

        if self.dropout > 0 and train:
            spatial = tuple(range(1, x.ndim - 1))
            x = nn.Dropout(rate=self.dropout, broadcast_dims=spatial)(
                x, deterministic=not train
            )

        # ---------------- wavelet path
        # scale/translation are per (out_g, in_g) pair within each group
        # (wav_kan_layers.py:119-122: shapes (1, out, in, 1, 1))
        st_shape = (self.groups, self.out_g, self.in_g)
        scale = self.param("scale", init_lib.ones, st_shape, self.param_dtype)
        translation = self.param("translation", init_lib.zeros, st_shape,
                                 self.param_dtype)

        # per-(o, i) spatial kernels == grouped conv with G*out_g groups
        wav_w = self.param(
            "wavelet_w",
            init_lib.kaiming_uniform("linear", layout="conv_hwio"),
            kshape + (self.in_g, self.groups * self.out_g),
            self.param_dtype,
        )

        y = self._maybe_fused_psi_conv(x, wav_w, translation, scale, kshape)
        if y is None:
            xw, tw, sw, ww = x, translation, scale, wav_w
            if self._island_bf16_on and x.dtype == jnp.float32:
                # bf16 compute island (see flag docstring): cast the
                # NARROW tensors; psi, its cotangent, and the grouped
                # conv are then natively bf16.  Base path / norm stay f32.
                xw, tw, sw, ww = (a.astype(jnp.bfloat16)
                                  for a in (x, translation, scale, wav_w))
            B = x.shape[0]
            spatial_shape = x.shape[1:-1]

            def build_psi(xw, tw, sw):
                if self._psi_build_mode == "flat":
                    # concat the INPUT pre-wavelet so the elementwise
                    # fusion writes the collapsed layout directly.
                    # Measured SLOWER than 'bcast' on config 4 (14.4k vs
                    # 16.4k img/s b1024, round 4): XLA materializes the
                    # concat instead of fusing it.  Kept for chips where
                    # the tradeoff differs.
                    return self._flat_psi(xw, tw, sw)
                # (B, *S, G, 1, in_g) - broadcast against (G, out_g,
                # in_g).  NOTE a per-(g,o) lane-concat rebuild of PSI
                # (the round-2 degree-major trick) was measured SLOWER
                # here (12.1k vs 14.4k img/s on config 4): XLA fuses this
                # broadcast form better than 64 explicit psi slices — see
                # KERNELS.md round 3.
                xg = xw.reshape(
                    (B,) + spatial_shape + (self.groups, 1, self.in_g))
                x_scaled = (xg - tw) / sw  # (B, *S, G, out_g, in_g)
                # channel axis (for shannon's hamming window) is in_g
                psi = wavelet(x_scaled, self.wavelet_type,
                              channel_axis=x_scaled.ndim - 1)

                return psi.reshape(
                    (B,) + spatial_shape
                    + (self.groups * self.out_g * self.in_g,)
                )

            if self._psi_remat_on:
                build_psi = jax.checkpoint(build_psi)
            flat = build_psi(xw, tw, sw)
            y = self._conv(
                flat, ww, stride=self.stride, padding=self.padding,
                dilation=self.dilation, groups=self.groups * self.out_g,
            )
            if y.dtype != x.dtype:
                y = y.astype(x.dtype)  # leave the bf16 island before mix
        # 1x1 output mix per group (wavelet_out, :139/:311)
        mix_w = self.param(
            "wavelet_out_w",
            init_lib.kaiming_uniform("linear", layout="conv_hwio"),
            (1,) * self.ndim + (self.out_g, self.output_dim),
            self.param_dtype,
        )
        y = conv_nd(y, mix_w, ndim=self.ndim, stride=1, padding=0,
                    dilation=1, groups=self.groups)

        out = y + base_out
        norm = make_norm(self.norm_layer, self.output_dim, **dict(self.norm_kwargs))
        return norm(out, train=train)


def _named(ndim: int):
    def ctor(input_dim, output_dim, kernel_size, **kwargs):
        kwargs.setdefault("norm_layer", BatchNorm)
        return WavKANConvND(
            input_dim=input_dim, output_dim=output_dim,
            kernel_size=kernel_size, ndim=ndim, **kwargs,
        )

    return ctor


WavKANConv1DLayer = _named(1)
WavKANConv2DLayer = _named(2)
WavKANConv3DLayer = _named(3)
