"""One-call serving wrapper.

Packages the deployment pipeline into a single object:

    predictor = Predictor.from_model(model)            # or .from_checkpoint
    logits = predictor(images)

Pipeline: deploy (bitpacked/int8 weights, folded epilogues) -> BN graph
folds -> stem/block megakernels -> bf16 float path -> one jitted forward
with fixed-batch padding (so every request hits the same compiled
executable).

Multi-chip serving: pass ``mesh=`` to split each request batch over the
mesh's ``data`` axis with ``shard_map`` (weights replicated, zero
collectives in the forward — each chip serves its batch shard
independently; the reference's analogue is ``nn.DataParallel``,
examples/cifar10.py:76). ``shard_map`` rather than GSPMD jit because the
Pallas megakernels cannot be auto-partitioned — inside the map each device
traces on its LOCAL batch, so the megakernel batch-cap dispatch applies
per chip.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..utils.precision import cast_floats
from .deploy import deploy
from .megablock import fuse_blocks
from .optimize import optimize_deployed
from .stem import fuse_stem, space_to_depth_stem

__all__ = ["Predictor"]


class Predictor:
    """Compiled inference endpoint for a (binarized) model."""

    def __init__(self, model: nnx.Module, *, batch_size: int = 32,
                 weight_format: str = "int8", dtype=jnp.bfloat16,
                 use_pallas: Optional[bool] = None, fold_bn: bool = True,
                 space_to_depth: bool = True, fuse: Optional[bool] = None,
                 max_fused_batch: int = 4, mesh=None, batch_axis: str = "data",
                 tensor_parallel: bool = False, model_axis: str = "model",
                 binary_gemm_impl: str = "mxu",
                 quantize_float_bits: Optional[int] = None):
        if use_pallas is None:
            # platform auto-detect: Mosaic kernels are TPU-only, so CPU/
            # GPU users get the exact XLA fallback from plain defaults
            use_pallas = jax.devices()[0].platform == "tpu"
        if tensor_parallel:
            if mesh is None or mesh.shape.get(model_axis, 1) <= 1:
                raise ValueError(
                    "tensor_parallel needs a mesh with a >1 model axis")
            # block megakernels reduce over conv1's FULL channels — they
            # cannot consume a channel shard, so TP serving stays unfused.
            # An EXPLICIT fuse=True is a contradiction the caller should
            # hear about (same policy as binary_gemm_impl below), not a
            # silent override a benchmarker would misread as "fused TP".
            if fuse is True:
                raise ValueError(
                    "tensor_parallel=True is incompatible with fuse=True: "
                    "block megakernels reduce over full channels and "
                    "cannot consume a channel shard")
            fuse = False
        if binary_gemm_impl != "mxu":
            # fusion would absorb most eligible layers into MXU megakernels,
            # silently overriding the requested popcount execution for all
            # but the leftovers — honor the request by serving unfused
            # (popcount is the bandwidth/ICI capability form, not a speed
            # path on-chip; see benchmarks/popcount_mode.py)
            if fuse is True:
                raise ValueError(
                    "binary_gemm_impl='%s' is incompatible with fuse=True: "
                    "the stage/block megakernels always execute on the MXU, "
                    "so fusion would override the requested GEMM "
                    "implementation for every absorbed layer"
                    % binary_gemm_impl)
            fuse = False
        model.eval()
        model = deploy(model, weight_format=weight_format,
                       use_pallas=use_pallas)
        if fold_bn:
            optimize_deployed(model)
        self.popcount_layers = []
        if binary_gemm_impl != "mxu":
            # packed-activation XNOR/popcount execution for eligible layers
            # (bandwidth variant — see deploy.set_gemm_impl)
            from .deploy import set_gemm_impl
            self.popcount_layers = set_gemm_impl(model, binary_gemm_impl)
        if quantize_float_bits is not None:
            # weight-only int8/int4 storage for the big float layers (the
            # classifier head); sign-feeding small convs stay float — see
            # inference/compress.py for why
            from .compress import quantize_float_layers
            model = quantize_float_layers(model, bits=quantize_float_bits)
        if space_to_depth:
            space_to_depth_stem(model)
        if fuse is None:  # megakernels are Pallas-TPU only, like use_pallas
            fuse = use_pallas
        if fuse:  # all dispatch per traced batch; no-op above the caps
            fuse_stem(model)
            # Full fusion: whole-stage chain kernels at B=1, per-block
            # megakernels (incl. strided) under the batch cap. Measured on
            # honest (non-degenerate) configs — torch-parity ternary sign
            # or PReLU — this wins at every small batch (B=1: 62 vs 236us
            # unfused; B=4: 151 vs 342). CAUTION for benchmarkers: a
            # zero_to_one=True model with post-act ReLU is DEGENERATE
            # (sign(relu(x)) == +1 — XLA folds the whole binary body away
            # and unfused timings measure nothing real; see
            # ROADMAP "Measurement discipline").
            from .stages import fuse_head, fuse_stages
            fuse_stages(model)
            fuse_blocks(model, max_fused_batch=max_fused_batch,
                        strided=True)
            # classifier avgpool + float fc fold into the last stage's
            # kernel (skipped automatically for quantized heads)
            fuse_head(model)
            # NOT applied: inference.fuse_entry (stem+layer1 as ONE
            # dispatch — the only junction without a stride-2 W-merge in
            # the way). Measured a wash at the whole-model level (B=1
            # 62us either way, v5e): TPU dispatches have no launch
            # overhead, so the five-dispatch structure is already at its
            # floor. Kept as an opt-in; see stages.FusedEntry.
        if dtype is not None:
            cast_floats(model, dtype)
        self.batch_size = batch_size
        self.dtype = dtype or jnp.float32
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.model_axis = model_axis
        self.tensor_parallel = tensor_parallel
        if tensor_parallel:
            from ..binarize import named_modules
            from .deploy import DeployedConv, DeployedLinear
            from .tp import tag_tensor_parallel
            self.tp_layers = tag_tensor_parallel(model, mesh, axis=model_axis)
            # audit surface: how much of the deployed model actually shards
            self.tp_total = sum(
                1 for _, m in named_modules(model)
                if isinstance(m, (DeployedConv, DeployedLinear)))
        self._graphdef, self._state = nnx.split(model)

        def _run(state, x):
            out = nnx.merge(self._graphdef, state)(x)
            return out[0] if isinstance(out, tuple) else out

        if mesh is None:
            self._forward = jax.jit(_run)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # a model-only mesh is legal for pure TP serving: requests
            # stay replicated (each chip holds a weight shard, not a
            # batch shard)
            n_shard = mesh.shape.get(batch_axis, 1)
            batch_spec = P(batch_axis) if batch_axis in mesh.shape else P()
            if batch_size % n_shard != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over the "
                    f"{n_shard}-way '{batch_axis}' mesh axis")
            if tensor_parallel:
                # north-star topology: each chip holds an out-channel shard
                # of every eligible layer's packed weights + epilogue; the
                # forward all-gathers per layer over ICI (inference.tp)
                from .tp import shard_tp_state, tp_state_specs
                merged = nnx.merge(self._graphdef, self._state)
                specs = tp_state_specs(merged, axis=model_axis)
                self._state = shard_tp_state(
                    jax.tree.map(jnp.asarray, self._state), specs, mesh)
                x_spec = batch_spec
                state_specs = specs
            else:
                # replicate the deployed weights; shard requests on batch
                self._state = jax.device_put(
                    jax.tree.map(jnp.asarray, self._state),
                    NamedSharding(mesh, P()))
                x_spec = batch_spec
                state_specs = P()
            sharded = jax.shard_map(
                _run, mesh=mesh, in_specs=(state_specs, x_spec),
                out_specs=x_spec, check_vma=False)
            self._forward = jax.jit(sharded)

    def export(self, path: str, input_shape, *, platforms=None) -> None:
        """Freeze this predictor into an on-disk serving bundle
        (StableHLO program + flat weight leaves) loadable with
        ``bnn_tpu.inference.load_serving`` — no flax or model classes
        needed at load time. See :mod:`bnn_tpu.inference.export`."""
        from .export import export_serving

        export_serving(self, path, input_shape, platforms=platforms)

    def served_model(self) -> nnx.Module:
        """Re-materialize the deployed model being served (graphdef merged
        with the live — possibly sharded — state). Public accessor so tools
        never need the private ``_graphdef``/``_state`` pair."""
        return nnx.merge(self._graphdef, self._state)

    def state_bytes(self) -> int:
        """Total LOGICAL bytes of the serving state (weights, scales,
        norm stats). With a data-parallel ``mesh=`` the state is
        replicated, so this equals the per-chip size; with
        ``tensor_parallel=True`` the tagged layers are sharded 1/P per
        chip, so per-chip HBM is smaller than this number (by up to the
        model-axis factor for the sharded leaves)."""
        from .compress import state_bytes as _sb
        return _sb(self.served_model())

    @classmethod
    def from_model(cls, model: nnx.Module, **kwargs) -> "Predictor":
        return cls(model, **kwargs)

    @classmethod
    def from_checkpoint(cls, path: str, model_fn: Callable[[], nnx.Module],
                        **kwargs) -> "Predictor":
        """Build the QAT model with ``model_fn``, restore the checkpoint,
        then deploy."""
        from ..utils.checkpoint import load_checkpoint, restore_into

        model = model_fn()
        restore_into(model, load_checkpoint(path))
        return cls(model, **kwargs)

    def __call__(self, x) -> jax.Array:
        """Predict on ``(N, ...)`` input; N is padded up to ``batch_size``
        multiples so every call reuses the same compiled program."""
        from .export import batched_call

        x = jnp.asarray(x, self.dtype)
        return batched_call(lambda xb: self._forward(self._state, xb),
                            x, self.batch_size, self.mesh)
