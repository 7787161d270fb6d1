"""Deployment pass: QAT binary model -> bitpacked inference model.

The runtime the reference explicitly lacks (README.md:22). Walks a binarized
model and replaces eligible binary layers with deployed equivalents that:

- store weights as packed int32 sign lanes (32x smaller than fp32 in HBM);
- fold the XNOR-Net weight alpha, the learnable output scale and the bias
  into a per-out-channel ``(scale, add)`` epilogue;
- execute via the fused Pallas :func:`~bnn_tpu.kernels.gemm.binary_gemm`
  (sign + unpack + MXU matmul + dequant in one kernel). Convolutions lower
  to patch extraction (im2col) + the same GEMM, so every binary layer's hot
  loop is the one kernel.

Eligibility: ``activation_pre_process`` must be a deterministic sign
(BasicInputBinarizer / AdvancedInputBinarizer forward), ``weight_pre_process``
an XNORWeightBinarizer, and the post-process one of BasicScaleBinarizer /
XNORScaleBinarizer / Identity. Anything else (stochastic binarizers, grouped
convs, float layers) is left untouched — the deployed model is always a
drop-in for the QAT model.

Numerics: identical to the QAT fake path computed in f32 (verified to 1e-7
on CPU), INCLUDING ``sign(0)``: each deployed layer reads its QAT
binarizer's ``zero_to_one`` flag and reproduces it exactly. The torch-parity
default (``sign(0) == 0``) makes activations effectively ternary
``{-1, 0, +1}`` — systematic after ReLU, which emits exact zeros in ~half
its outputs — and the int8 compute paths represent that 0 exactly at no
cost. (Only packed-ACTIVATION kernels like ``kernels.popcount_gemm``, which
are not used by these modules, require strictly-binary ``zero_to_one=True``
training.) On TPU at default matmul
precision the QAT path itself truncates ``alpha * sign(W)`` to bf16
(~3e-3/layer); the deployed path does the exact ±1 integer dot and applies
``alpha`` in f32 afterwards, so it is strictly MORE accurate than the QAT
baseline it replaces.
"""
from __future__ import annotations



from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax

from .. import functional as F
from .. import layers as blayers
from ..binarize import named_modules, set_module_by_name
from ..kernels.conv import binary_conv2d_s1, supports as _pallas_conv_supports
from ..kernels.gemm import (binary_gemm, binary_gemm_reference, popcount_gemm,
                            popcount_gemm_reference)
from ..kernels.packing import pack_bits, unpack_bits
from ..ops.binarizers import (
    AdvancedInputBinarizer,
    BasicInputBinarizer,
    BasicScaleBinarizer,
    Identity,
    XNORScaleBinarizer,
    XNORWeightBinarizer,
)

__all__ = ["deploy", "DeployedLinear", "DeployedConv", "packed_weight_bytes",
           "model_weight_bytes", "set_gemm_impl"]


def _fold_epilogue(layer) -> tuple:
    """Precompute packed weights and the per-out-channel (scale, add).

    QAT forward: ``post(op(sign(x), wpre(W)) + bias, x)`` with
    ``wpre(W) = alpha_w * sign(W')``; folding gives
    ``out = [sign(x) @ sign(W')] * (alpha_w * alpha_post) + bias * alpha_post``
    (then XNORScale's spatial K applied outside the GEMM if present).
    """
    wb = layer.weight_pre_process
    w = layer.kernel[...]
    if wb.center_weights:
        w = w - jnp.mean(w, axis=-2, keepdims=True)
    out_ch = w.shape[-1]
    if wb.compute_alpha:
        alpha_w = jnp.mean(jnp.abs(w), axis=tuple(range(w.ndim - 1)))  # (O,)
    else:
        alpha_w = jnp.ones((out_ch,), jnp.float32)

    post = layer.activation_post_process
    if isinstance(post, BasicScaleBinarizer):
        alpha_post = post.alpha[...].reshape(-1)
        assert alpha_post.shape == (out_ch,), (
            "custom-shaped BasicScaleBinarizer alpha cannot be folded; "
            f"got {alpha_post.shape}"
        )
    else:
        alpha_post = jnp.ones((out_ch,), jnp.float32)

    scale = (alpha_w * alpha_post).astype(jnp.float32)
    bias = layer.bias[...] if layer.bias is not None else None
    add = (bias * alpha_post).astype(jnp.float32) if bias is not None else None

    # pack the sign bits of the (possibly centered) kernel, reduction axis
    # flattened to the second-to-last position
    w2d = w.reshape(-1, out_ch)  # (K, O) with K = prod(spatial) * in_ch
    packed = pack_bits(w2d, axis=-2)
    return packed, w2d.shape[0], scale, add


def _spatial_post(post):
    return post if isinstance(post, XNORScaleBinarizer) else None


def _zero_to_one(layer) -> bool:
    """The QAT input binarizer's sign(0) convention (False = torch parity)."""
    return bool(getattr(layer.activation_pre_process, "zero_to_one", False))


def _sign(x, thr, zero_to_one: bool):
    """``sign(x - thr)`` with the layer's sign(0) convention; weak-typed
    ``{-1, 0, +1}`` (0 only when ``zero_to_one=False``), exact in int8."""
    if zero_to_one:
        return jnp.where(x >= thr, 1, -1)
    return jnp.where(x > thr, 1, jnp.where(x < thr, -1, 0))


def _tp_gather(layer, y: jax.Array) -> jax.Array:
    """Reassemble full out-channels from a tensor-parallel shard.

    No-op unless :func:`bnn_tpu.inference.tp.tag_tensor_parallel` marked the
    layer for sharded serving (in which case this executes inside
    ``shard_map`` and the local ``y`` holds ``O / n_shards`` channels)."""
    axis = getattr(layer, "tp_axis", None)
    if axis is not None:
        y = lax.all_gather(y, axis, axis=y.ndim - 1, tiled=True)
    return y


class DeployedLinear(nnx.Module):
    """Bitpacked dense layer executing via the fused binary GEMM."""

    def __init__(self, layer: blayers.Linear, *, use_pallas: bool = True,
                 interpret: bool = False):
        self.in_features = layer.in_features
        self.out_features = layer.out_features
        packed, k, scale, add = _fold_epilogue(layer)
        self.w_packed = nnx.Variable(packed)
        self.scale = nnx.Variable(scale)
        self.add = nnx.Variable(add if add is not None
                                else jnp.zeros_like(scale))
        self.k = k
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.spatial_post = _spatial_post(layer.activation_post_process)
        self.zero_to_one = _zero_to_one(layer)
        # set by inference.tp.tag_tensor_parallel: when serving under
        # shard_map, w_packed/scale/add hold only this chip's out-channel
        # shard and the layer all-gathers its output over this mesh axis
        self.tp_axis = None
        # 'mxu' (default int8-MXU binary_gemm) or 'popcount' (packed
        # activations + VPU XNOR/popcount — the bandwidth variant; set via
        # set_gemm_impl, requires zero_to_one training)
        self.gemm_impl = "mxu"

    def __call__(self, x: jax.Array) -> jax.Array:
        lead = x.shape[:-1]
        x2d = x.reshape(-1, x.shape[-1])
        if self.gemm_impl == "popcount":
            # activations stream at 1 bit/element: pack_bits signs with the
            # deployed sign(0)=+1 convention, which is exactly the
            # zero_to_one QAT semantics this mode requires
            if self.use_pallas:
                y = popcount_gemm(pack_bits(x2d, axis=-1), self.w_packed[...],
                                  self.k, self.scale[...], self.add[...],
                                  interpret=self.interpret)
            else:
                y = popcount_gemm_reference(x2d, self.w_packed[...], self.k,
                                            self.scale[...], self.add[...])
            y = y.astype(self.scale[...].dtype)
            y = y.reshape(lead + (-1,))
            y = _tp_gather(self, y)
            if self.spatial_post is not None:
                y = self.spatial_post(y, x)
            return y
        # zero_to_one=True signs inside the kernel (free); torch-parity
        # sign(0)=0 pre-signs to ternary int-exact values (kernels consume
        # {-1, 0, +1} exactly with sign_inputs=False)
        if not self.zero_to_one:
            x2d = _sign(x2d, 0.0, False).astype(x2d.dtype)
        si = self.zero_to_one
        if self.use_pallas:
            y = binary_gemm(x2d, self.w_packed[...], self.k,
                            self.scale[...], self.add[...],
                            sign_inputs=si, interpret=self.interpret)
        else:
            y = binary_gemm_reference(x2d, self.w_packed[...], self.k,
                                      self.scale[...], self.add[...],
                                      sign_inputs=si)
        y = y.astype(self.scale[...].dtype)
        y = y.reshape(lead + (-1,))
        y = _tp_gather(self, y)
        if self.spatial_post is not None:
            y = self.spatial_post(y, x)
        return y


class DeployedConv(nnx.Module):
    """Bitpacked convolution.

    Two execution modes over the same packed storage (auto-selected):

    - ``gemm``: 1x1/stride-1 convs collapse to the fused Pallas binary GEMM
      (no patch materialization needed);
    - ``conv``: KxK convs unpack the packed weights to ``+/-1`` bf16 *in
      graph* (a few VPU ops on a tensor that is tiny next to the activations)
      and run XLA's MXU conv with the dequant epilogue fused by XLA. This
      avoids the O(k^2) im2col activation blow-up that makes patch-GEMM
      uncompetitive at ImageNet spatial sizes, while keeping weights packed
      in HBM/checkpoints.

    ``mode='im2col'`` forces the patch+GEMM path (useful for small feature
    maps). The packed weight K-ordering matches
    ``lax.conv_general_dilated_patches`` (channel-major, filter positions
    row-major).
    """

    def __init__(self, layer, *, use_pallas: bool = True, interpret: bool = False,
                 mode: str = "auto", weight_format: str = "packed"):
        self.in_channels = layer.in_channels
        self.out_channels = layer.out_channels
        self.kernel_size = layer.kernel_size
        self.stride = layer.stride
        self.padding = layer.padding
        self.dilation = layer.dilation
        self.groups = layer.groups

        wb = layer.weight_pre_process
        w = layer.kernel[...]
        # centering uses the ORIGINAL in-channel axis (reference
        # bnn/ops.py:130-132)
        w_eff = w - jnp.mean(w, axis=-2, keepdims=True) if wb.center_weights else w
        out_ch = w.shape[-1]
        if wb.compute_alpha:
            alpha_w = jnp.mean(jnp.abs(w_eff), axis=tuple(range(w.ndim - 1)))
        else:
            alpha_w = jnp.ones((out_ch,), jnp.float32)
        post = layer.activation_post_process
        if isinstance(post, BasicScaleBinarizer):
            alpha_post = post.alpha[...].reshape(-1)
        else:
            alpha_post = jnp.ones((out_ch,), jnp.float32)
        scale = (alpha_w * alpha_post).astype(jnp.float32)
        bias = layer.bias[...] if layer.bias is not None else None
        add = ((bias * alpha_post).astype(jnp.float32) if bias is not None
               else jnp.zeros_like(scale))

        if mode == "auto":
            # fused Pallas GEMM wins for pointwise convs with a big-enough
            # reduction; below 256 the int32-tile K padding wastes MXU work.
            # Grouped convs (BATS: groups=12 throughout,
            # reference bnn/models/layers/bats_ops.py:108-173) always take
            # the XLA grouped-conv path — the GEMM formulation would need a
            # block-diagonal weight matrix that wastes G x the MXU work.
            k_flat = w_eff.size // out_ch
            mode = ("gemm" if (self.groups == 1 and self._is_pointwise()
                               and k_flat >= 256) else "conv")
        if self.groups != 1 and mode not in ("conv",):
            raise NotImplementedError(
                f"grouped deployed convs support mode='conv' only, got {mode}")
        self.mode = mode

        self.weight_format = weight_format
        if mode in ("conv", "pallas-conv") and weight_format == "int8":
            # speed format: +/-1 int8 weights stored directly (8x smaller
            # than fp32; zero unpack work in the hot path)
            self.w_packed = nnx.Variable(
                jnp.where(w_eff >= 0, 1, -1).astype(jnp.int8))
            self.k = w_eff.shape[-2]
        elif mode in ("conv", "pallas-conv"):
            # max-compression format (32x): pack in the kernel's own
            # (*spatial, I, O) layout: unpacking is then a pure
            # bit-expansion with NO transpose in the hot path
            self.w_packed = nnx.Variable(pack_bits(w_eff, axis=-2))
            self.k = w_eff.shape[-2]  # in-channels
        else:
            # GEMM paths need the patch-extraction order (channel-major):
            # (I, *spatial) flattened on the K axis
            w2d = jnp.moveaxis(w_eff, -2, 0).reshape(-1, out_ch)
            self.w_packed = nnx.Variable(pack_bits(w2d, axis=-2))
            self.k = w2d.shape[0]
        self.scale = nnx.Variable(scale)
        self.add = nnx.Variable(add)
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.spatial_post = _spatial_post(layer.activation_post_process)
        # optional per-in-channel sign threshold (set by the BN-before fold
        # in inference.optimize); sign becomes sign(x - threshold)
        self.threshold = None
        self.zero_to_one = _zero_to_one(layer)
        # tensor-parallel serving marker (see inference.tp)
        self.tp_axis = None
        # 'mxu' | 'popcount' (pointwise gemm-mode convs only; set_gemm_impl)
        self.gemm_impl = "mxu"

    def _sign_in(self, x: jax.Array) -> jax.Array:
        thr = self.threshold[...] if self.threshold is not None else 0.0
        return _sign(x, thr, self.zero_to_one)

    def _is_pointwise(self) -> bool:
        nd = len(self.kernel_size)
        if any(k != 1 for k in self.kernel_size):
            return False
        if F._ntuple(self.stride, nd) != (1,) * nd:
            return False
        if F._ntuple(self.dilation, nd) != (1,) * nd:
            return False
        if isinstance(self.padding, str):
            return True  # SAME == VALID for a 1x1 stride-1 conv
        return all(p == 0 for p in F._ntuple(self.padding, nd))

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.gemm_impl == "popcount":
            return self._call_popcount(x)
        if self.mode in ("gemm", "im2col"):
            return self._call_im2col(x)
        if self.mode == "pallas-conv":
            return self._call_pallas_conv(x)
        return self._call_conv(x)

    def _call_popcount(self, x: jax.Array) -> jax.Array:
        """Packed-activation XNOR/popcount execution (pointwise convs).

        Every patch element of a 1x1/s1/p0 conv is a real activation (no
        conv zero-padding, which the strictly-binary packed form cannot
        represent), so the popcount dot is exact. ``pack_bits`` applies the
        sign(0)=+1 / zero_to_one convention during packing."""
        lead = x.shape[:-1]
        x2d = x.reshape(-1, x.shape[-1])
        if self.threshold is not None:
            x2d = x2d - self.threshold[...]
        if self.use_pallas:
            y = popcount_gemm(pack_bits(x2d, axis=-1), self.w_packed[...],
                              self.k, self.scale[...], self.add[...],
                              interpret=self.interpret)
        else:
            y = popcount_gemm_reference(x2d, self.w_packed[...], self.k,
                                        self.scale[...], self.add[...])
        y = y.astype(self.scale[...].dtype).reshape(lead + (-1,))
        y = _tp_gather(self, y)
        if self.spatial_post is not None:
            y = self.spatial_post(y, x)
        return y

    def _call_pallas_conv(self, x: jax.Array) -> jax.Array:
        """Experimental fully-fused Pallas conv (stride-1 only); the XLA
        int8 conv path (`_call_conv`) is faster in practice — XLA's int8
        conv runs near the MXU int8 roofline — so this is opt-in."""
        if not _pallas_conv_supports(self.kernel_size, self.stride,
                                     self.padding, self.dilation, 1):
            raise ValueError(
                "pallas-conv mode supports stride-1 odd square kernels only; "
                f"got kernel_size={self.kernel_size} stride={self.stride} "
                f"padding={self.padding} dilation={self.dilation}")
        if self.weight_format == "int8":
            w = self.w_packed[...]
        else:
            w = unpack_bits(self.w_packed[...], self.k, axis=-2,
                            dtype=jnp.int8)[..., : self.k, :]
        xin = x if self.threshold is None else x - self.threshold[...]
        y = binary_conv2d_s1(xin, w, self.scale[...], self.add[...],
                             interpret=self.interpret)
        y = _tp_gather(self, y)
        if self.spatial_post is not None:
            y = self.spatial_post(y, x)
        return y

    def _call_conv(self, x: jax.Array) -> jax.Array:
        # +/-1 int8 weights (unpacked in-graph from bit-packed storage, or
        # stored int8 directly in the 'int8' speed format) feed the conv on
        # the MXU's int8 mode with exact int32 accumulation — 2x the bf16
        # rate on TPU v5e; +/-1 operands are exactly representable, so
        # binary nets get the int8 speed tier for free. Dequant in f32.
        if self.weight_format == "int8":
            w = self.w_packed[...]
        else:
            w = unpack_bits(self.w_packed[...], self.k, axis=-2,
                            dtype=jnp.int8)
            w = w[..., : self.k, :]  # drop I padding rows
        xs = self._sign_in(x).astype(jnp.int8)
        y = F.conv(xs, w, self.stride, self.padding, self.dilation,
                   self.groups, preferred_element_type=jnp.int32)
        # epilogue in the scale's dtype (f32 by default; bf16 after
        # utils.cast_floats for a bandwidth-halved float path)
        y = y.astype(self.scale[...].dtype) * self.scale[...] + self.add[...]
        y = _tp_gather(self, y)
        if self.spatial_post is not None:
            y = self.spatial_post(y, x)
        return y

    def _call_im2col(self, x: jax.Array) -> jax.Array:
        nd = len(self.kernel_size)
        # sign BEFORE patch extraction so conv zero-padding contributes
        # exactly 0 (not sign(0)=+1) — matching conv(sign(x), ...) semantics
        xs = self._sign_in(x).astype(jnp.bfloat16)
        patches = lax.conv_general_dilated_patches(
            xs,
            filter_shape=self.kernel_size,
            window_strides=F._ntuple(self.stride, nd),
            padding=F.to_lax_padding(self.padding, nd),
            rhs_dilation=F._ntuple(self.dilation, nd),
            dimension_numbers=("NHWC", "HWIO", "NHWC") if nd == 2
            else ("NWC", "WIO", "NWC"),
        )  # (N, *out_spatial, K)
        lead = patches.shape[:-1]
        p2d = patches.reshape(-1, patches.shape[-1])
        if self.use_pallas:
            y = binary_gemm(p2d, self.w_packed[...], self.k,
                            self.scale[...], self.add[...],
                            sign_inputs=False, interpret=self.interpret)
        else:
            y = binary_gemm_reference(p2d, self.w_packed[...], self.k,
                                      self.scale[...], self.add[...],
                                      sign_inputs=False)
        y = y.astype(self.scale[...].dtype).reshape(lead + (-1,))
        y = _tp_gather(self, y)
        if self.spatial_post is not None:
            y = self.spatial_post(y, x)
        return y


_SIGN_PRE = (BasicInputBinarizer, AdvancedInputBinarizer)


def _eligible(m) -> bool:
    if not isinstance(m, (blayers.Linear, blayers.Conv1d, blayers.Conv2d)):
        return False
    if not isinstance(m.activation_pre_process, _SIGN_PRE):
        return False
    if not isinstance(m.weight_pre_process, XNORWeightBinarizer):
        return False
    if not isinstance(m.activation_post_process,
                      (BasicScaleBinarizer, XNORScaleBinarizer, Identity)):
        return False
    if (isinstance(m.activation_post_process, BasicScaleBinarizer)
            and m.activation_post_process.alpha[...].ndim != 1):
        return False
    return True


def deploy(model: nnx.Module, *, use_pallas: Optional[bool] = None,
           interpret: bool = False, weight_format: str = "packed") -> nnx.Module:
    """Replace eligible binary layers with bitpacked deployed layers.

    ``weight_format``: ``'packed'`` (1-bit lanes, 32x compression, weights
    unpacked to int8 in-graph) or ``'int8'`` (8x compression, zero unpack
    work — the latency-optimal serving format).

    ``use_pallas=None`` resolves by platform: Pallas kernels on TPU, the
    exact XLA fallback elsewhere (Mosaic kernels don't run on CPU/GPU) —
    except under ``interpret=True``, which forces the kernel paths in
    Pallas interpret mode (the documented way to exercise them off-TPU).

    Returns the mutated model (or the replacement module if the model itself
    is a single eligible layer). Ineligible layers are left as-is.
    """
    if use_pallas is None:
        use_pallas = interpret or jax.devices()[0].platform == "tpu"
    replacements = {}
    for name, m in named_modules(model):
        if _eligible(m):
            if isinstance(m, blayers.Linear):
                replacements[name] = DeployedLinear(
                    m, use_pallas=use_pallas, interpret=interpret)
            else:
                replacements[name] = DeployedConv(
                    m, use_pallas=use_pallas, interpret=interpret,
                    weight_format=weight_format)
    if "" in replacements:
        return replacements[""]
    for name, new in replacements.items():
        set_module_by_name(model, name, new)
    return model


def set_gemm_impl(model: nnx.Module, impl: str = "popcount"):
    """Switch eligible deployed layers between binary GEMM implementations.

    ``'mxu'`` (default): int8-MXU :func:`~bnn_tpu.kernels.gemm.binary_gemm`
    — the compute-rate-optimal path (~354 TOP/s measured on v5e).
    ``'popcount'``: packed activations + VPU XNOR/popcount
    (:func:`~bnn_tpu.kernels.gemm.popcount_gemm`) — activations stream at
    1 bit/element, the compute form whose activations can cross ICI packed.
    Measured end to end on v5e (benchmarks/popcount_mode.py, round 3) it is
    4-12x SLOWER than 'mxu' at every serving shape tested — the in-graph
    ``pack_bits`` pass plus the VPU's popcount rate never beat the int8 MXU
    on-chip — so this is a capability/off-chip-bandwidth mode, not a speed
    mode.

    Eligible for popcount: layers trained with ``zero_to_one=True`` (the
    strictly-binary convention packing implements; torch-parity ternary
    sign(0)=0 cannot be represented in packed bits) — dense layers, and
    pointwise convs on the GEMM path (conv zero-padding never enters the
    patch, so the packed dot stays exact). Everything else keeps 'mxu'.
    Returns the names switched.
    """
    if impl not in ("mxu", "popcount"):
        # must raise, not assert: under ``python -O`` a typo'd impl would
        # fall through and silently keep serving 'mxu' while reporting
        # layers as switched
        raise ValueError(f"unknown gemm impl {impl!r}; "
                         "expected 'mxu' or 'popcount'")
    changed = []
    for name, m in named_modules(model):
        if impl == "mxu":
            if getattr(m, "gemm_impl", "mxu") != "mxu":
                m.gemm_impl = "mxu"
                changed.append(name)
        elif isinstance(m, DeployedLinear) and m.zero_to_one:
            m.gemm_impl = impl
            changed.append(name)
        elif (isinstance(m, DeployedConv) and m.zero_to_one
              and m.groups == 1 and m._is_pointwise()):
            if m.mode not in ("gemm", "im2col"):
                # normalize conv-mode storage to the (Kw, O) GEMM layout —
                # for a 1x1 kernel the two orderings coincide modulo the
                # leading unit spatial dims
                wp = m.w_packed[...]
                if m.weight_format == "int8":
                    wp = pack_bits(wp.astype(jnp.float32), axis=-2)
                    m.weight_format = "packed"
                m.w_packed = nnx.Variable(wp.reshape(-1, wp.shape[-1]))
                m.mode = "gemm"
            m.gemm_impl = impl
            changed.append(name)
    return changed


def packed_weight_bytes(model: nnx.Module) -> int:
    """Bytes of packed weight storage in a deployed model."""
    total = 0
    for _, m in named_modules(model):
        if isinstance(m, (DeployedLinear, DeployedConv)):
            total += m.w_packed[...].size * m.w_packed[...].dtype.itemsize
    return total


def model_weight_bytes(model: nnx.Module) -> int:
    """Total bytes of all kernel/packed-kernel parameters (for compression
    reporting)."""
    total = 0
    for _, m in named_modules(model):
        if isinstance(m, (DeployedLinear, DeployedConv)):
            total += m.w_packed[...].size * m.w_packed[...].dtype.itemsize
        elif hasattr(m, "kernel") and isinstance(getattr(m, "kernel"), nnx.Param):
            total += m.kernel[...].size * m.kernel[...].dtype.itemsize
    return total
