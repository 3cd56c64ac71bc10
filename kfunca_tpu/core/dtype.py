"""Scalar type system for kfunca_tpu.

Capability-equivalent rebuild of the reference dtype layer
(/root/reference/src/core/include/scalar_type.h:9-27 enum order,
 tensor_iterator.cpp:32-44 promotion rule,
 accumulate_type.h:17-42 accumulation mapping), expressed over JAX dtypes.

Enum order matters: the reference promotion rule is "float beats int, wider
enum wins among floats / among signed ints / among unsigned ints, signed
beats unsigned".  Note BFloat16 > Half in this ordering.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class ScalarType(enum.IntEnum):
    Bool = 0
    Byte = 1  # uint8
    Char = 2  # int8
    Short = 3  # int16
    Int = 4  # int32
    Long = 5  # int64
    Half = 6  # float16
    BFloat16 = 7
    Float = 8  # float32
    Double = 9  # float64
    Undefined = 10


_JNP_DTYPE = {
    ScalarType.Bool: jnp.bool_,
    ScalarType.Byte: jnp.uint8,
    ScalarType.Char: jnp.int8,
    ScalarType.Short: jnp.int16,
    ScalarType.Int: jnp.int32,
    ScalarType.Long: jnp.int64,
    ScalarType.Half: jnp.float16,
    ScalarType.BFloat16: jnp.bfloat16,
    ScalarType.Float: jnp.float32,
    ScalarType.Double: jnp.float64,
}

_ELEMENT_SIZE = {
    ScalarType.Bool: 1,
    ScalarType.Byte: 1,
    ScalarType.Char: 1,
    ScalarType.Short: 2,
    ScalarType.Int: 4,
    ScalarType.Long: 8,
    ScalarType.Half: 2,
    ScalarType.BFloat16: 2,
    ScalarType.Float: 4,
    ScalarType.Double: 8,
}

# numpy dtype name -> ScalarType (from_numpy ingest table; the reference
# supports the 8 numpy basic dtypes, register.cpp:17-25, plus we accept the
# 16-bit floats for completeness).
_NUMPY_TO_SCALAR = {
    "bool": ScalarType.Bool,
    "uint8": ScalarType.Byte,
    "int8": ScalarType.Char,
    "int16": ScalarType.Short,
    "int32": ScalarType.Int,
    "int64": ScalarType.Long,
    "float16": ScalarType.Half,
    "bfloat16": ScalarType.BFloat16,
    "float32": ScalarType.Float,
    "float64": ScalarType.Double,
}


def from_numpy_dtype(np_dtype) -> ScalarType:
    name = np.dtype(np_dtype).name if np_dtype != jnp.bfloat16 else "bfloat16"
    try:
        return _NUMPY_TO_SCALAR[name]
    except KeyError:
        raise TypeError(f"Unsupported numpy dtype in from_numpy(): {np_dtype}")


def to_jnp(dtype: ScalarType):
    return _JNP_DTYPE[dtype]


def element_size(dtype: ScalarType) -> int:
    return _ELEMENT_SIZE[dtype]


def is_floating_type(t: ScalarType) -> bool:
    return t in (ScalarType.Half, ScalarType.BFloat16, ScalarType.Float, ScalarType.Double)


def is_unsigned_int_type(t: ScalarType) -> bool:
    return t == ScalarType.Byte


def is_integral_type(t: ScalarType) -> bool:
    return t in (
        ScalarType.Bool,
        ScalarType.Byte,
        ScalarType.Char,
        ScalarType.Short,
        ScalarType.Int,
        ScalarType.Long,
    )


def promote(a: ScalarType, b: ScalarType) -> ScalarType:
    """Two-operand type promotion (reference tensor_iterator.cpp:32-44).

    float beats int; among floats/signed-ints/unsigned-ints the wider enum
    wins; signed beats unsigned.
    """
    if a == ScalarType.Undefined:
        return b
    if b == ScalarType.Undefined:
        return a
    if is_floating_type(a) and is_floating_type(b):
        return a if a >= b else b
    if is_floating_type(a) or is_floating_type(b):
        return a if is_floating_type(a) else b
    if is_unsigned_int_type(a) and is_unsigned_int_type(b):
        return a if a >= b else b
    if is_unsigned_int_type(a) or is_unsigned_int_type(b):
        return b if is_unsigned_int_type(a) else a
    return a if a >= b else b


def accumulate_type(t: ScalarType) -> ScalarType:
    """Accumulation dtype used for arithmetic (reference accumulate_type.h:17-42).

    half/bf16 math runs in fp32; integer math accumulates in int64.
    """
    if t in (ScalarType.Half, ScalarType.BFloat16, ScalarType.Float):
        return ScalarType.Float
    if t == ScalarType.Double:
        return ScalarType.Double
    if t == ScalarType.Bool:
        return ScalarType.Bool
    return ScalarType.Long
