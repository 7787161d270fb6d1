"""BATS: Binary Architecture Search networks (ECCV'20).

Cell-based genotype networks, channels-last re-implementation of reference
bnn/models/bats.py. Stochastic behaviors (drop-path, shake-shake) are driven
by an NNX RNG stream and gated on ``self.deterministic`` (flipped by
``model.train()`` / ``model.eval()``), replacing torch's implicit
``self.training`` and global RNG.

Set ``model.drop_path_prob`` between epochs exactly like the reference
(bnn/models/bats.py:145, 200).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn
from .layers.bats_ops import (
    OPS,
    FactorizedReduce,
    Genotype,
    ReLUConvBN,
    drop_path,
)

# An example genotype (DARTS-V2-style topology) so the networks are usable
# out of the box; searched BATS genotypes from the paper can be passed instead.
BATS_EXAMPLE = Genotype(
    normal=[("sep_conv_3x3", 0), ("sep_conv_3x3", 1),
            ("sep_conv_3x3", 0), ("sep_conv_3x3", 1),
            ("sep_conv_3x3", 1), ("skip_connect", 0),
            ("skip_connect", 0), ("dil_conv_3x3", 2)],
    normal_concat=[2, 3, 4, 5],
    reduce=[("max_pool_3x3", 0), ("max_pool_3x3", 1),
            ("skip_connect", 2), ("max_pool_3x3", 1),
            ("max_pool_3x3", 0), ("skip_connect", 2),
            ("skip_connect", 2), ("max_pool_3x3", 1)],
    reduce_concat=[2, 3, 4, 5],
)


class Cell(nnx.Module):
    def __init__(self, genotype: Genotype, C_prev_prev: int, C_prev: int, C: int,
                 reduction: bool, reduction_prev: bool, groups: int = 12,
                 use_shake_shake: bool = False, *, rngs: nnx.Rngs):
        self.use_shake_shake = use_shake_shake
        self.deterministic = True
        self.rngs = rngs
        if reduction_prev:
            self.preprocess0 = FactorizedReduce(C_prev_prev, C, rngs=rngs)
        else:
            self.preprocess0 = ReLUConvBN(C_prev_prev, C, 1, 1, 0, rngs=rngs)
        self.preprocess1 = ReLUConvBN(C_prev, C, 1, 1, 0, rngs=rngs)
        if reduction:
            op_names, indices = zip(*genotype.reduce)
            concat = genotype.reduce_concat
        else:
            op_names, indices = zip(*genotype.normal)
            concat = genotype.normal_concat
        self._compile(C, op_names, indices, concat, reduction, groups, rngs)

    def _compile(self, C, op_names, indices, concat, reduction, groups, rngs):
        assert len(op_names) == len(indices)
        self._steps = len(op_names) // 2
        self._concat = list(concat)
        self.multiplier = len(concat)
        self._ops = nn.ModuleList()
        for name, index in zip(op_names, indices):
            stride = 2 if reduction and index < 2 else 1
            self._ops.append(OPS[name](C, stride, True, True, groups, rngs))
        self._indices = list(indices)

    def __call__(self, s0: jax.Array, s1: jax.Array,
                 drop_prob: float = 0.0) -> jax.Array:
        s0 = self.preprocess0(s0)
        s1 = self.preprocess1(s1)

        states = [s0, s1]
        for i in range(self._steps):
            h1 = states[self._indices[2 * i]]
            h2 = states[self._indices[2 * i + 1]]
            op1 = self._ops[2 * i]
            op2 = self._ops[2 * i + 1]
            h1 = op1(h1)
            h2 = op2(h2)
            if not self.deterministic and drop_prob > 0.0:
                if not isinstance(op1, nn.Identity):
                    h1 = drop_path(h1, drop_prob, self.rngs.dropout())
                if not isinstance(op2, nn.Identity):
                    h2 = drop_path(h2, drop_prob, self.rngs.dropout())
            states.append(h1 + h2)

        if self.use_shake_shake:
            if not self.deterministic:
                shake = jax.nn.softmax(
                    jax.random.uniform(self.rngs.dropout(), (len(self._concat),))
                )
                return jnp.concatenate(
                    [states[i] * shake[j] for j, i in enumerate(self._concat)],
                    axis=-1,
                )
            return jnp.concatenate(
                [states[i] * (1.0 / len(self._concat)) for i in self._concat],
                axis=-1,
            )
        return jnp.concatenate([states[i] for i in self._concat], axis=-1)


class AuxiliaryHead(nnx.Module):
    """Auxiliary classifier head (reference: bnn/models/bats.py:86-105)."""

    def __init__(self, C: int, num_classes: int, stride: int, *, rngs: nnx.Rngs):
        self.features = nn.Sequential(
            nn.AvgPool2d(5, stride=stride, padding=0, count_include_pad=False),
            nn.BatchNorm2d(C, rngs=rngs),
            nn.Conv2d(C, 128, 1, bias=False, rngs=rngs),
            nn.PReLU(num_parameters=128, rngs=rngs),
            nn.BatchNorm2d(128, rngs=rngs),
            nn.Conv2d(128, 768, 2, bias=False, rngs=rngs),
            nn.PReLU(num_parameters=768, rngs=rngs),
        )
        self.classifier = nn.Linear(768, num_classes, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.features(x)
        return self.classifier(x.reshape(x.shape[0], -1))


class BATSNetworkCIFAR(nnx.Module):
    """CIFAR-scale BATS network (reference: bnn/models/bats.py:108-151)."""

    def __init__(self, C: int, num_classes: int, layers: int, auxiliary: bool,
                 genotype: Genotype, groups: int = 12, *,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self._layers = layers
        self._auxiliary = auxiliary
        self.deterministic = True
        self.drop_path_prob = 0.0
        stem_multiplier = 3
        C_curr = stem_multiplier * C
        self.stem = nn.Sequential(
            nn.Conv2d(3, C_curr, 3, padding=1, bias=False, rngs=rngs),
            nn.BatchNorm2d(C_curr, rngs=rngs),
            nn.ReLU(),
        )
        C_prev_prev, C_prev, C_curr = C_curr, C_curr, C
        self.cells = nn.ModuleList()
        reduction_prev = False
        C_to_auxiliary = None
        for i in range(layers):
            if i in (layers // 3, 2 * layers // 3):
                C_curr *= 2
                reduction = True
            else:
                reduction = False
            cell = Cell(genotype, C_prev_prev, C_prev, C_curr, reduction,
                        reduction_prev, groups, rngs=rngs)
            reduction_prev = reduction
            self.cells.append(cell)
            C_prev_prev, C_prev = C_prev, cell.multiplier * C_curr
            if i == 2 * layers // 3:
                C_to_auxiliary = C_prev
        if auxiliary:
            self.auxiliary_head = AuxiliaryHead(C_to_auxiliary, num_classes, 3,
                                                rngs=rngs)
        self.global_pooling = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Linear(C_prev, num_classes, rngs=rngs)

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Optional[jax.Array]]:
        logits_aux = None
        s0 = s1 = self.stem(x)
        for i, cell in enumerate(self.cells):
            s0, s1 = s1, cell(s0, s1, self.drop_path_prob)
            if i == 2 * self._layers // 3:
                if self._auxiliary and not self.deterministic:
                    logits_aux = self.auxiliary_head(s1)
        out = self.global_pooling(s1)
        logits = self.classifier(out.reshape(out.shape[0], -1))
        return logits, logits_aux


class BATSNetworkImageNet(nnx.Module):
    """ImageNet-scale BATS network (reference: bnn/models/bats.py:154-206)."""

    def __init__(self, C: int, num_classes: int, layers: int, auxiliary: bool,
                 genotype: Genotype, groups: int = 12, *,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self._layers = layers
        self._auxiliary = auxiliary
        self.deterministic = True
        self.drop_path_prob = 0.0

        self.stem0 = nn.Sequential(
            nn.Conv2d(3, C // 2, kernel_size=3, stride=2, padding=1, bias=False,
                      rngs=rngs),
            nn.BatchNorm2d(C // 2, rngs=rngs),
            nn.ReLU(),
            nn.Conv2d(C // 2, C, 3, stride=2, padding=1, bias=False,
                      groups=max(C // 20, 1), rngs=rngs),
            nn.BatchNorm2d(C, rngs=rngs),
        )
        self.stem1 = nn.Sequential(
            nn.ReLU(),
            nn.Conv2d(C, C, 3, stride=2, padding=1, bias=False,
                      groups=max(C // 20, 1), rngs=rngs),
            nn.BatchNorm2d(C, rngs=rngs),
        )
        C_prev_prev, C_prev, C_curr = C, C, C

        self.cells = nn.ModuleList()
        reduction_prev = True
        C_to_auxiliary = None
        for i in range(layers):
            if i in (layers // 3, 2 * layers // 3):
                C_curr *= 2
                reduction = True
            else:
                reduction = False
            cell = Cell(genotype, C_prev_prev, C_prev, C_curr, reduction,
                        reduction_prev, groups, rngs=rngs)
            reduction_prev = reduction
            self.cells.append(cell)
            C_prev_prev, C_prev = C_prev, cell.multiplier * C_curr
            if i == 2 * layers // 3:
                C_to_auxiliary = C_prev

        if auxiliary:
            self.auxiliary_head = AuxiliaryHead(C_to_auxiliary, num_classes, 2,
                                                rngs=rngs)
        self.global_pooling = nn.AvgPool2d(7)
        self.classifier = nn.Linear(C_prev, num_classes, rngs=rngs)

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Optional[jax.Array]]:
        logits_aux = None
        s0 = self.stem0(x)
        s1 = self.stem1(s0)
        for i, cell in enumerate(self.cells):
            s0, s1 = s1, cell(s0, s1, self.drop_path_prob)
            if i == 2 * self._layers // 3:
                if self._auxiliary and not self.deterministic:
                    logits_aux = self.auxiliary_head(s1)
        out = self.global_pooling(s1)
        logits = self.classifier(out.reshape(out.shape[0], -1))
        return logits, logits_aux
