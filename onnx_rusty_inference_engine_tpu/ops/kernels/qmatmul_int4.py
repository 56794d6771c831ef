"""Fused INT4 weight-only matmul Pallas kernel.

Decode-step matmuls are HBM-bandwidth-bound by weight reads. The naive
lowering (unpack int4 -> bf16 matrix -> matmul) materializes the full bf16
weight matrix, paying 4x the packed traffic and erasing the point of int4.
This kernel keeps weights PACKED (uint8 nibble pairs) in HBM, streams packed
blocks into VMEM, and unpacks + block-dequantizes right before each MXU dot
— HBM traffic stays at K*N/2 bytes + scales.

Layout contract = quant.pack_int4: packed [N, K//2] uint8 where byte j holds
q[2j] (lo nibble) and q[2j+1] (hi nibble), value+8; scales fp32 [N, K/qblock].

Mosaic-friendly formulation (no in-kernel reshapes or interleaves — Mosaic
cannot merge/insert minor dims for sub-32-bit vectors):
the ACTIVATIONS are de-interleaved once outside the kernel into
a_lo = a[:, 0::2], a_hi = a[:, 1::2]  (both [M, K/2], an XLA strided slice),
so that  Y = A_lo @ LOᵀ + A_hi @ HIᵀ  where LO/HI are the nibble planes of
the packed bytes — each plane is used in place, never re-interleaved.
Per-quant-block scales are applied to each block's dot RESULT as a
row-vector broadcast:  Y = Σ_t (A_lo,t @ LO_tᵀ + A_hi,t @ HI_tᵀ) · s_t[None,:].
In half-K space a quant block is qblock/2 lanes wide, so lane slices are
128-aligned whenever qblock % 256 == 0 (the quantizer's default block).
Small-K weights fall back to one whole-dimension block (always legal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _int4_mm_kernel(alo_ref, ahi_ref, p_ref, s_ref, out_ref, acc_ref,
                    *, qbh: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # nibble math in int32: Mosaic has no sub-32-bit integer subtract/shift
    p = p_ref[:].astype(jnp.int32)  # [bn, bkh]
    lo = ((p & 0xF) - 8).astype(jnp.bfloat16)
    hi = ((p >> 4) - 8).astype(jnp.bfloat16)
    nsub = p.shape[1] // qbh
    dn = (((1,), (1,)), ((), ()))
    acc = acc_ref[:]
    for t in range(nsub):
        sl = slice(t * qbh, (t + 1) * qbh)
        dot = jax.lax.dot_general(alo_ref[:, sl], lo[:, sl], dn,
                                  preferred_element_type=jnp.float32)
        dot += jax.lax.dot_general(ahi_ref[:, sl], hi[:, sl], dn,
                                   preferred_element_type=jnp.float32)
        acc = acc + dot * s_ref[t:t + 1, :]  # per-(n, block) scale, [1, bn]
    acc_ref[:] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def int4_fused_supported(K: int, n_blocks: int) -> bool:
    """True when the Pallas kernel handles this (K, quant-block) layout."""
    qblock = K // n_blocks
    return n_blocks == 1 or (qblock // 2) % 128 == 0


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "interpret"))
def qmatmul_int4_bf16(
    a: jax.Array,        # bf16/f32 [M, K] activations
    packed: jax.Array,   # uint8 [N, K//2] (quant.pack_int4 layout)
    scales: jax.Array,   # fp32 [N, K // qblock]
    *,
    block_m: int = 128,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Weight-packed int4 matmul -> f32 [M, N]."""
    M, K = a.shape
    N, Kh = packed.shape
    n_blocks = scales.shape[1]
    qbh = Kh // n_blocks  # quant block width in half-K space
    assert int4_fused_supported(K, n_blocks), \
        "int4 fused kernel needs qblock % 256 == 0 (or a single quant block)"
    # K tile spans 8 quantization blocks (the scales operand's sublane tile)
    # when there are enough; otherwise one whole-K block.
    nsub = 8 if (n_blocks >= 8 and qbh % 128 == 0) else n_blocks
    block_kh = nsub * qbh
    # decode steps have tiny M (batch*1 token): shrink the M block to the
    # bf16 sublane tile instead of zero-padding 8 -> 128 every call
    block_m = min(block_m, _round_up(M, 16))

    a = a.astype(jnp.bfloat16)
    a_lo, a_hi = a[:, 0::2], a[:, 1::2]  # [M, Kh] each (XLA, outside Pallas)
    scales_t = scales.T  # [n_blocks, N] — k-major for sublane tiling

    Mp = _round_up(M, block_m)
    Np = _round_up(N, block_n)
    Khp = _round_up(Kh, block_kh)
    nbp = Khp // qbh
    if (Mp, Khp) != (M, Kh):
        a_lo = jnp.pad(a_lo, ((0, Mp - M), (0, Khp - Kh)))
        a_hi = jnp.pad(a_hi, ((0, Mp - M), (0, Khp - Kh)))
    if (Np, Khp) != (N, Kh):
        packed = jnp.pad(packed, ((0, Np - N), (0, Khp - Kh)))
        scales_t = jnp.pad(scales_t, ((0, nbp - n_blocks), (0, Np - N)))

    out = pl.pallas_call(
        functools.partial(_int4_mm_kernel, qbh=qbh),
        grid=(Mp // block_m, Np // block_n, Khp // block_kh),
        in_specs=[
            pl.BlockSpec((block_m, block_kh), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_kh), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, block_kh), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Khp * 2,
            bytes_accessed=Mp * Khp * 4 + Np * Khp + Mp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_lo, a_hi, packed, scales_t)
    return out[:M, :N]


# --------------------------------------------------------------------------
# Planar layout (quant.pack_int4_planar): byte j = q[j] | q[j + K/2] << 4.
# The nibble planes are the CONTIGUOUS halves of K, so the activation split
# is a[:, :K/2] / a[:, K/2:] — plain slices that fuse into the pad — instead
# of the stride-2 gathers the interleaved layout forces (~155 us/step on the
# GPT-2 decode graph, PERF.md). Each half carries its own per-block scales.
# --------------------------------------------------------------------------
def _int4_mm_planar_kernel(alo_ref, ahi_ref, p_ref, slo_ref, shi_ref,
                           out_ref, acc_ref, *, qb: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:].astype(jnp.int32)  # [bn, bkh]
    lo = ((p & 0xF) - 8).astype(jnp.bfloat16)
    hi = ((p >> 4) - 8).astype(jnp.bfloat16)
    nsub = p.shape[1] // qb
    dn = (((1,), (1,)), ((), ()))
    acc = acc_ref[:]
    for t in range(nsub):
        sl = slice(t * qb, (t + 1) * qb)
        dlo = jax.lax.dot_general(alo_ref[:, sl], lo[:, sl], dn,
                                  preferred_element_type=jnp.float32)
        dhi = jax.lax.dot_general(ahi_ref[:, sl], hi[:, sl], dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + dlo * slo_ref[t:t + 1, :] + dhi * shi_ref[t:t + 1, :]
    acc_ref[:] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def int4_planar_supported(K: int, n_scale_cols: int) -> bool:
    """True when the planar kernel handles this (K, scales) layout."""
    Kh, nbh = K // 2, n_scale_cols // 2
    if nbh == 0 or Kh % nbh:
        return False
    qb = Kh // nbh
    return nbh == 1 or qb % 128 == 0


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "interpret"))
def qmatmul_int4_planar(
    a: jax.Array,        # bf16/f32 [M, K] activations
    packed: jax.Array,   # uint8 [N, K//2] (quant.pack_int4_planar layout)
    scales: jax.Array,   # fp32 [N, 2*nbh] (lo-half blocks then hi-half)
    *,
    block_m: int = 128,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Planar-packed int4 matmul -> f32 [M, N]."""
    M, K = a.shape
    N, Kh = packed.shape
    nbh = scales.shape[1] // 2
    qb = Kh // nbh
    assert int4_planar_supported(K, scales.shape[1]), \
        "planar int4 kernel needs per-half qblock % 128 == 0 (or one block)"
    nsub = 8 if (nbh >= 8 and qb % 128 == 0) else nbh
    block_kh = nsub * qb
    block_m = min(block_m, _round_up(M, 16))

    a = a.astype(jnp.bfloat16)
    a_lo, a_hi = a[:, :Kh], a[:, Kh:]  # contiguous halves
    s_lo = scales[:, :nbh].T  # [nbh, N] — k-major for sublane tiling
    s_hi = scales[:, nbh:].T

    Mp = _round_up(M, block_m)
    Np = _round_up(N, block_n)
    Khp = _round_up(Kh, block_kh)
    nbp = Khp // qb
    if (Mp, Khp) != (M, Kh):
        a_lo = jnp.pad(a_lo, ((0, Mp - M), (0, Khp - Kh)))
        a_hi = jnp.pad(a_hi, ((0, Mp - M), (0, Khp - Kh)))
    if (Np, Khp) != (N, Kh):
        packed = jnp.pad(packed, ((0, Np - N), (0, Khp - Kh)))
        s_lo = jnp.pad(s_lo, ((0, nbp - nbh), (0, Np - N)))
        s_hi = jnp.pad(s_hi, ((0, nbp - nbh), (0, Np - N)))

    out = pl.pallas_call(
        functools.partial(_int4_mm_planar_kernel, qb=qb),
        grid=(Mp // block_m, Np // block_n, Khp // block_kh),
        in_specs=[
            pl.BlockSpec((block_m, block_kh), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_kh), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, block_kh), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Khp * 2,
            bytes_accessed=Mp * Khp * 4 + Np * Khp + Mp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_lo, a_hi, packed, s_lo, s_hi)
    return out[:M, :N]
