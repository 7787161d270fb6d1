"""Straight-through estimators (STE) as pure JAX functions.

TPU-native re-design of the reference's ``torch.autograd.Function`` binarizers
(reference: bnn/ops.py:51-92). Instead of imperative autograd Functions we use
``jax.custom_vjp`` so the same primitives compose with ``jit``/``grad``/
``vmap``/``shard_map`` and trace into a single XLA computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sign",
    "sign_ste",
    "sign_pm1_ste",
    "stochastic_sign_ste",
    "surrogate_sign",
    "resolve_surrogate",
    "SURROGATES",
    "tanh_surrogate_sign",
    "SignActivation",
    "SignActivationStochastic",
]


def sign(x: jax.Array) -> jax.Array:
    """Element-wise sign with sign(0) == 0 (matches ``torch.sign``)."""
    return jnp.sign(x)


@jax.custom_vjp
def sign_ste(x: jax.Array) -> jax.Array:
    """sign(x) forward; hardtanh straight-through gradient.

    Backward passes the cotangent where ``|x| < 1`` (strictly) and zeroes it
    elsewhere — exactly the mask of the reference implementation
    (bnn/ops.py:68-73 zeroes where ``x >= 1`` or ``x <= -1``).
    """
    return jnp.sign(x)


def _sign_ste_fwd(x):
    return jnp.sign(x), x


def _sign_ste_bwd(x, g):
    mask = (x > -1.0) & (x < 1.0)
    return (jnp.where(mask, g, jnp.zeros_like(g)),)


sign_ste.defvjp(_sign_ste_fwd, _sign_ste_bwd)


@jax.custom_vjp
def sign_pm1_ste(x: jax.Array) -> jax.Array:
    """Strictly-binary sign: ``+1 where x >= 0 else -1``, hardtanh STE.

    Unlike :func:`sign_ste` (which matches ``torch.sign`` with
    ``sign(0) == 0``), this maps exact zeros to ``+1`` — the deployment
    convention of the bitpacked engine. Training with this variant makes the
    QAT forward bit-identical to the deployed forward (important after ReLU,
    which produces exact zeros).
    """
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _sign_pm1_fwd(x):
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype), x


sign_pm1_ste.defvjp(_sign_pm1_fwd, _sign_ste_bwd)


@jax.custom_vjp
def _stochastic_sign(x: jax.Array, noise: jax.Array) -> jax.Array:
    # round((x+1)/2 + U[-0.5, 0.5]) clipped to {0,1}, mapped to {-1,+1}
    # (reference: bnn/ops.py:88-92).
    p = jnp.clip((x + 1.0) * 0.5 + noise, 0.0, 1.0)
    return jnp.round(p) * 2.0 - 1.0


def _stochastic_sign_fwd(x, noise):
    return _stochastic_sign(x, noise), x


def _stochastic_sign_bwd(x, g):
    mask = (x > -1.0) & (x < 1.0)
    return jnp.where(mask, g, jnp.zeros_like(g)), None


_stochastic_sign.defvjp(_stochastic_sign_fwd, _stochastic_sign_bwd)


def stochastic_sign_ste(x: jax.Array, key: jax.Array) -> jax.Array:
    """Stochastic binarization: P(+1) grows with x; hardtanh STE gradient.

    ``key`` is a JAX PRNG key (replaces the reference's implicit
    ``torch.rand_like``, bnn/ops.py:91).
    """
    noise = jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
    return _stochastic_sign(x, noise)


class SignActivation:
    """Name-compatibility shim for the reference's ``torch.autograd.Function``
    (``SignActivation.apply(x)``, reference bnn/ops.py:51-73). The JAX-native
    form is :func:`sign_ste`; this class exists so user code ported from the
    reference keeps working verbatim."""

    @staticmethod
    def apply(x: jax.Array) -> jax.Array:
        return sign_ste(x)

    def __call__(self, x: jax.Array) -> jax.Array:
        return sign_ste(x)


class SignActivationStochastic:
    """Shim for the reference's stochastic Function (bnn/ops.py:76-92).

    The JAX-native form is :func:`stochastic_sign_ste`, which takes an
    explicit PRNG key; ``apply`` accepts one as the second argument."""

    @staticmethod
    def apply(x: jax.Array, key: jax.Array) -> jax.Array:
        return stochastic_sign_ste(x, key)

    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        return stochastic_sign_ste(x, key)


# named surrogate functions for recipe/YAML resolution (the reference takes
# an arbitrary ``derivative_funct`` callable, bnn/ops.py:168-171; strings
# make the same knob declarable in recipes without eval)
SURROGATES = {
    "tanh": jnp.tanh,
    "erf": jax.scipy.special.erf,
    "softsign": lambda x: x / (1.0 + jnp.abs(x)),
    "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "sin": lambda x: jnp.sin(jnp.clip(x, -jnp.pi / 2, jnp.pi / 2)),
}


def resolve_surrogate(funct):
    """A surrogate spec (callable or name in :data:`SURROGATES`) -> callable."""
    if callable(funct):
        return funct
    try:
        return SURROGATES[funct]
    except KeyError:
        raise ValueError(
            f"unknown surrogate {funct!r}; known names: "
            f"{sorted(SURROGATES)} (or pass any callable)") from None


def surrogate_sign(x: jax.Array, funct="tanh", t: float = 5.0) -> jax.Array:
    """sign(x) forward with d/dx funct(t*x) surrogate gradient.

    Intended semantics of the reference's ``AdvancedInputBinarizer``
    (bnn/ops.py:167-177), with the reference's pluggable ``derivative_funct``
    generalized to any odd squashing function — by name (see
    :data:`SURROGATES`) or as a callable. NOTE: the reference's
    implementation re-binds ``x`` under ``torch.no_grad`` and therefore
    accidentally detaches the output from the graph entirely; we implement
    the documented intent (gradients flow through the surrogate) rather than
    replicating that bug.
    """
    y = resolve_surrogate(funct)(x * t)
    return y + jax.lax.stop_gradient(jnp.sign(y) - y)


def tanh_surrogate_sign(x: jax.Array, t: float = 5.0) -> jax.Array:
    """sign(x) forward with d/dx tanh(t*x) surrogate gradient (the
    reference's default ``derivative_funct``; see :func:`surrogate_sign`)."""
    return surrogate_sign(x, jnp.tanh, t)
