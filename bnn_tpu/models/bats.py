"""BATS: Binary Architecture Search networks (ECCV'20).

Cell-based genotype networks, channels-last re-implementation of the
capability of reference bnn/models/bats.py. The two public networks share
one trunk implementation (`_CellNetwork`): a stack of genotype-compiled
cells with channel doubling + reduction at the 1/3 and 2/3 depth marks, an
optional auxiliary classifier tapped at the 2/3 mark, and a pooled linear
head. They differ only in their stems and pooling, which the reference
spells out twice (bnn/models/bats.py:108-151 vs :154-206) and we don't.

Stochastic behaviors (drop-path, shake-shake) draw from an NNX RNG stream
and are gated on ``self.deterministic`` (flipped by ``model.train()`` /
``model.eval()``), replacing torch's implicit ``self.training`` and global
RNG. Set ``model.drop_path_prob`` between epochs exactly like the reference
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
    """One genotype-compiled DAG cell.

    Each intermediate node sums two op-transformed predecessor states; the
    cell output concatenates the genotype's ``concat`` nodes along channels
    (so ``multiplier = len(concat)`` times C output channels). Reduction
    cells stride-2 every op that reads a cell input.
    """

    def __init__(self, genotype: Genotype, C_prev_prev: int, C_prev: int,
                 C: int, reduction: bool, reduction_prev: bool,
                 groups: int = 12, use_shake_shake: bool = False, *,
                 rngs: nnx.Rngs):
        self.use_shake_shake = use_shake_shake
        self.deterministic = True
        self.rngs = rngs
        # inputs arrive at different resolutions when the previous cell
        # reduced: align s0 with a factorized reduce, else a 1x1 ReLUConvBN
        self.preprocess0 = (
            FactorizedReduce(C_prev_prev, C, rngs=rngs) if reduction_prev
            else ReLUConvBN(C_prev_prev, C, 1, 1, 0, rngs=rngs))
        self.preprocess1 = ReLUConvBN(C_prev, C, 1, 1, 0, rngs=rngs)

        edges = list(genotype.reduce if reduction else genotype.normal)
        self._concat = list(genotype.reduce_concat if reduction
                            else genotype.normal_concat)
        self.multiplier = len(self._concat)
        self._steps = len(edges) // 2
        self._indices = [src for _, src in edges]
        self._ops = nn.ModuleList()
        for op_name, src in edges:
            stride = 2 if reduction and src < 2 else 1
            self._ops.append(OPS[op_name](C, stride, True, True, groups, rngs))

    def _edge(self, op, state: jax.Array, drop_prob: float) -> jax.Array:
        h = op(state)
        if (drop_prob > 0.0 and not self.deterministic
                and not isinstance(op, nn.Identity)):
            h = drop_path(h, drop_prob, self.rngs.dropout())
        return h

    def _gather(self, states: List[jax.Array]) -> jax.Array:
        outs = [states[i] for i in self._concat]
        if self.use_shake_shake:
            if self.deterministic:
                outs = [o / len(outs) for o in outs]
            else:
                mix = jax.nn.softmax(jax.random.uniform(
                    self.rngs.dropout(), (len(outs),)))
                outs = [o * mix[j] for j, o in enumerate(outs)]
        return jnp.concatenate(outs, axis=-1)

    def __call__(self, s0: jax.Array, s1: jax.Array,
                 drop_prob: float = 0.0) -> jax.Array:
        states = [self.preprocess0(s0), self.preprocess1(s1)]
        for i in range(self._steps):
            a, b = self._indices[2 * i], self._indices[2 * i + 1]
            states.append(
                self._edge(self._ops[2 * i], states[a], drop_prob)
                + self._edge(self._ops[2 * i + 1], states[b], drop_prob))
        return self._gather(states)


class AuxiliaryHead(nnx.Module):
    """Auxiliary classifier head (reference: bnn/models/bats.py:86-105)."""

    def __init__(self, C: int, num_classes: int, stride: int, *,
                 rngs: nnx.Rngs):
        self.features = nn.Sequential(
            nn.AvgPool2d(5, stride=stride, padding=0,
                         count_include_pad=False),
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


class _CellNetwork(nnx.Module):
    """Shared cell-stack trunk behind both BATS networks."""

    # subclasses set: aux head's pooling stride
    _aux_stride: int = 3

    def __init__(self, C: int, num_classes: int, layers: int, auxiliary: bool,
                 genotype: Genotype, groups: int, chans_in: Tuple[int, int],
                 reduction_prev: bool, rngs: nnx.Rngs):
        self._layers = layers
        self._auxiliary = auxiliary
        self._aux_at = 2 * layers // 3
        self.deterministic = True
        self.drop_path_prob = 0.0

        self.cells = nn.ModuleList()
        c_pp, c_p = chans_in
        c = C
        aux_chans = None
        for depth in range(layers):
            reduction = depth in (layers // 3, self._aux_at)
            if reduction:
                c *= 2
            cell = Cell(genotype, c_pp, c_p, c, reduction, reduction_prev,
                        groups, rngs=rngs)
            self.cells.append(cell)
            reduction_prev = reduction
            c_pp, c_p = c_p, cell.multiplier * c
            if depth == self._aux_at:
                aux_chans = c_p
        if auxiliary:
            self.auxiliary_head = AuxiliaryHead(
                aux_chans, num_classes, self._aux_stride, rngs=rngs)
        self.classifier = nn.Linear(c_p, num_classes, rngs=rngs)

    def _stem_states(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Optional[jax.Array]]:
        s0, s1 = self._stem_states(x)
        logits_aux = None
        for depth, cell in enumerate(self.cells):
            s0, s1 = s1, cell(s0, s1, self.drop_path_prob)
            if (depth == self._aux_at and self._auxiliary
                    and not self.deterministic):
                logits_aux = self.auxiliary_head(s1)
        pooled = self.global_pooling(s1)
        return self.classifier(pooled.reshape(pooled.shape[0], -1)), logits_aux


class BATSNetworkCIFAR(_CellNetwork):
    """CIFAR-scale BATS network: single 3x3 stem, both cell inputs fed from
    it (reference: bnn/models/bats.py:108-151)."""

    _aux_stride = 3

    def __init__(self, C: int, num_classes: int, layers: int, auxiliary: bool,
                 genotype: Genotype, groups: int = 12, *,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = nnx.Rngs(0) if rngs is None else rngs
        stem_width = 3 * C
        self.stem = nn.Sequential(
            nn.Conv2d(3, stem_width, 3, padding=1, bias=False, rngs=rngs),
            nn.BatchNorm2d(stem_width, rngs=rngs),
            nn.ReLU(),
        )
        super().__init__(C, num_classes, layers, auxiliary, genotype, groups,
                         chans_in=(stem_width, stem_width),
                         reduction_prev=False, rngs=rngs)
        self.global_pooling = nn.AdaptiveAvgPool2d(1)

    def _stem_states(self, x):
        s = self.stem(x)
        return s, s


class BATSNetworkImageNet(_CellNetwork):
    """ImageNet-scale BATS network: two-stage grouped-conv stem providing
    the cells' two inputs at x4 and x8 downsampling (reference:
    bnn/models/bats.py:154-206)."""

    _aux_stride = 2

    def __init__(self, C: int, num_classes: int, layers: int, auxiliary: bool,
                 genotype: Genotype, groups: int = 12, *,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = nnx.Rngs(0) if rngs is None else rngs
        g = max(C // 20, 1)
        self.stem0 = nn.Sequential(
            nn.Conv2d(3, C // 2, kernel_size=3, stride=2, padding=1,
                      bias=False, rngs=rngs),
            nn.BatchNorm2d(C // 2, rngs=rngs),
            nn.ReLU(),
            nn.Conv2d(C // 2, C, 3, stride=2, padding=1, bias=False,
                      groups=g, rngs=rngs),
            nn.BatchNorm2d(C, rngs=rngs),
        )
        self.stem1 = nn.Sequential(
            nn.ReLU(),
            nn.Conv2d(C, C, 3, stride=2, padding=1, bias=False, groups=g,
                      rngs=rngs),
            nn.BatchNorm2d(C, rngs=rngs),
        )
        super().__init__(C, num_classes, layers, auxiliary, genotype, groups,
                         chans_in=(C, C), reduction_prev=True, rngs=rngs)
        self.global_pooling = nn.AvgPool2d(7)

    def _stem_states(self, x):
        s0 = self.stem0(x)
        return s0, self.stem1(s0)
