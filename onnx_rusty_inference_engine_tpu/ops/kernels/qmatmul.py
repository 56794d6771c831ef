"""Fused INT8 matmul Pallas kernel (MXU, int32 accumulation).

The Pallas analog of the reference's hottest code path — its scalar
im2col-row multiply-accumulate loop (reference: src/inference_fp32_ops/
convolution_op.rs:407-504) and 2-D `ndarray::dot` (mul_op.rs:23) — redesigned
for the MXU: int8 tiles staged in VMEM, 128-aligned blocks, K-innermost grid
with an int32 VMEM accumulator, optional fused requantization epilogue so the
int8 result never round-trips through HBM in fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mm_kernel(a_ref, b_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _mm_requant_kernel(a_ref, b_ref, mult_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = jnp.round(acc_ref[:].astype(jnp.float32) * mult_ref[:])
        out_ref[:] = jnp.clip(y, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def qmatmul_int8(
    a: jax.Array,
    b: jax.Array,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
) -> jax.Array:
    """int8[M,K] @ int8[K,N] -> int32[M,N] on the MXU."""
    M, K = a.shape
    K2, N = b.shape
    assert K == K2
    Mp, Np, Kp = _round_up(M, block_m), _round_up(N, block_n), _round_up(K, block_k)
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))

    out = pl.pallas_call(
        _mm_kernel,
        grid=(Mp // block_m, Np // block_n, Kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.int32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np * 4,
            transcendentals=0,
        ),
    )(a, b)
    return out[:M, :N]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def qmatmul_int8_requant(
    a: jax.Array,
    b: jax.Array,
    mult: jax.Array,  # fp32 [N] or scalar: x_scale * w_scale / y_scale
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
) -> jax.Array:
    """int8 matmul with the requant epilogue fused in VMEM -> int8[M,N]."""
    M, K = a.shape
    _, N = b.shape
    Mp, Np, Kp = _round_up(M, block_m), _round_up(N, block_n), _round_up(K, block_k)
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
    mult_row = jnp.broadcast_to(
        mult.astype(jnp.float32).reshape(1, -1) if mult.ndim else
        jnp.full((1, N), mult, jnp.float32), (1, N))
    if Np != N:
        mult_row = jnp.pad(mult_row, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        _mm_requant_kernel,
        grid=(Mp // block_m, Np // block_n, Kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.int8),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np,
            transcendentals=0,
        ),
    )(a, b, mult_row)
    return out[:M, :N]
