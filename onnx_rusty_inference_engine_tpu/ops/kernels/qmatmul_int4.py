"""Fused INT4 weight-only matmul Pallas kernel.

Decode-step matmuls are HBM-bandwidth-bound by weight reads. The naive
lowering (unpack int4 -> bf16 matrix -> matmul) materializes the full bf16
weight matrix, paying 4x the packed traffic and erasing the point of int4.
This kernel keeps weights PACKED (uint8 nibble pairs) in HBM, streams packed
blocks into VMEM, and unpacks + block-dequantizes right before each MXU dot
— HBM traffic stays at K*N/2 bytes + scales.

Layout contract = quant.pack_int4: packed [N, K//2] uint8 (k-major nibbles,
value+8), scales fp32 [N, K/block]. The kernel requires the quant block size
to be a multiple of the K-tile (it reshapes scales per tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _int4_mm_kernel(a_ref, p_ref, s_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:]  # [bn, bk//2] uint8
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    bn, half = p.shape
    w = jnp.stack([lo, hi], axis=-1).reshape(bn, half * 2)  # [bn, bk] int4 vals
    wf = w.astype(jnp.bfloat16) * s_ref[:].astype(jnp.bfloat16)  # [bn,1] bcast
    # contract a[k] with w[k]: a [bm, bk] x wf [bn, bk] -> [bm, bn]
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], wf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                              "interpret"))
def qmatmul_int4_bf16(
    a: jax.Array,        # bf16/f32 [M, K] activations
    packed: jax.Array,   # uint8 [N, K//2] (quant.pack_int4 layout)
    scales: jax.Array,   # fp32 [N, K // qblock]
    *,
    block_m: int = 128,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Weight-packed int4 matmul -> f32 [M, N]."""
    M, K = a.shape
    N = packed.shape[0]
    n_blocks = scales.shape[1]
    qblock = K // n_blocks
    # one scale column per K-tile: the K tile IS the quantization block
    block_k = qblock
    a = a.astype(jnp.bfloat16)

    Mp = _round_up(M, block_m)
    Np = _round_up(N, block_n)
    Kp = _round_up(K, block_k)
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    if (Np, Kp) != (N, K):
        packed = jnp.pad(packed, ((0, Np - N), (0, (Kp - K) // 2)))
        scales = jnp.pad(scales, ((0, Np - N), (0, (Kp - K) // qblock)))

    out = pl.pallas_call(
        _int4_mm_kernel,
        grid=(Mp // block_m, Np // block_n, Kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, block_k // 2), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + Np * Kp // 2 + Mp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, packed, scales)
    return out[:M, :N]
