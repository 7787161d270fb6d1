from .ste import (SURROGATES, SignActivation, SignActivationStochastic, sign,
                  sign_ste, sign_pm1_ste, stochastic_sign_ste, surrogate_sign,
                  tanh_surrogate_sign)
from .registry import register, resolve, registered_names
from .binarizers import (
    BinarizerBase,
    Identity,
    BasicInputBinarizer,
    StochasticInputBinarizer,
    AdvancedInputBinarizer,
    XNORWeightBinarizer,
    BasicScaleBinarizer,
    XNORScaleBinarizer,
)

__all__ = [
    "sign",
    "sign_ste",
    "sign_pm1_ste",
    "stochastic_sign_ste",
    "surrogate_sign",
    "SURROGATES",
    "tanh_surrogate_sign",
    "SignActivation",
    "SignActivationStochastic",
    "register",
    "resolve",
    "registered_names",
    "BinarizerBase",
    "Identity",
    "BasicInputBinarizer",
    "StochasticInputBinarizer",
    "AdvancedInputBinarizer",
    "XNORWeightBinarizer",
    "BasicScaleBinarizer",
    "XNORScaleBinarizer",
]
