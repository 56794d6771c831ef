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


def _mm_requant_kernel(a_ref, b_ref, mult_ref, bias_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[:] + bias_ref[:]
        y = jnp.round(acc.astype(jnp.float32) * mult_ref[:])
        out_ref[:] = jnp.clip(y, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                              "interpret"))
def qmatmul_int8(
    a: jax.Array,
    b: jax.Array,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
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
        interpret=interpret,
    )(a, b)
    return out[:M, :N]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                              "interpret"))
def qmatmul_int8_requant(
    a: jax.Array,
    b: jax.Array,
    mult: jax.Array,  # fp32 [N] or scalar: x_scale * w_scale / y_scale
    bias: Optional[jax.Array] = None,  # int32 [N], added pre-requant
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """int8 matmul with int32 bias + requant epilogue fused in VMEM -> int8[M,N].

    This is the fused dequant->contract->requant north-star kernel shape:
    the int8 result never round-trips through HBM in fp32."""
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
    bias_row = (bias.astype(jnp.int32).reshape(1, -1) if bias is not None
                else jnp.zeros((1, N), jnp.int32))
    if Np != N:
        bias_row = jnp.pad(bias_row, ((0, 0), (0, Np - N)))

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
        interpret=interpret,
    )(a, b, mult_row, bias_row)
    return out[:M, :N]


def qconv1x1_int8_requant(x, w, mult, bias=None, *, interpret=False):
    """Fused QLinearConv for 1x1/stride-1 convs: NCHW int8 activations are
    re-laid as a [B·H·W, C_in] matrix and run through the fused
    matmul+bias+requant kernel (1x1 conv IS a matmul on the MXU).

    x: int8 [B, C_in, H, W]; w: int8 [C_out, C_in, 1, 1];
    mult: fp32 scalar or [C_out]; bias: int32 [C_out] or None.
    Returns int8 [B, C_out, H, W]."""
    B, C, H, W = x.shape
    O = w.shape[0]
    xm = jnp.transpose(x, (0, 2, 3, 1)).reshape(B * H * W, C)
    wm = jnp.transpose(w.reshape(O, C), (1, 0))  # [C_in, C_out]
    y = qmatmul_int8_requant(xm, wm, jnp.asarray(mult), bias,
                             interpret=interpret)
    return jnp.transpose(y.reshape(B, H, W, O), (0, 3, 1, 2))
