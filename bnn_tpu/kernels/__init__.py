from .packing import pack_bits, packed_words, unpack_bits
from .gemm import (binary_gemm, binary_gemm_reference, popcount_gemm,
                   popcount_gemm_reference)

__all__ = [
    "pack_bits",
    "packed_words",
    "unpack_bits",
    "binary_gemm",
    "binary_gemm_reference",
    "popcount_gemm",
    "popcount_gemm_reference",
]
