"""Binarizer-state copying between swapped modules.

Equivalent of the reference's ``copy_paramters`` (bnn/layers/helpers.py:7-17):
when a recipe step re-wraps an already-binary layer with ``update=True``, any
binarizer-internal parameters (e.g. the learnable ``alpha`` of
``BasicScaleBinarizer``) whose names and shapes match are carried over.
"""
from __future__ import annotations


from flax import nnx


_BINARIZER_SLOTS = (
    "activation_pre_process",
    "activation_post_process",
    "weight_pre_process",
)


def copy_parameters(source_mod: nnx.Module, target_mod: nnx.Module, bconfig) -> None:
    for slot in _BINARIZER_SLOTS:
        src = getattr(source_mod, slot, None)
        dst = getattr(target_mod, slot, None)
        if src is None or dst is None:
            continue
        src_state = nnx.to_flat_state(nnx.state(src, nnx.Param))
        dst_state = dict(nnx.to_flat_state(nnx.state(dst, nnx.Param)))
        for path, src_param in src_state:
            if path in dst_state and dst_state[path][...].shape == src_param[...].shape:
                # write through to the live module so shared refs stay intact
                obj = dst
                for key in path[:-1]:
                    obj = getattr(obj, str(key))
                getattr(obj, str(path[-1]))[...] = src_param[...]


# keep the reference's (misspelled) public name as an alias for parity
copy_paramters = copy_parameters
