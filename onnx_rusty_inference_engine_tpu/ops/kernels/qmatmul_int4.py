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
# The nibble planes are the CONTIGUOUS halves of K, so in the aligned case
# the wrapper launches the pallas_call with ZERO auxiliary XLA ops: the
# activation is passed twice with index maps offset by half of K (no
# stride-2 gathers, no slices), scales arrive pre-transposed k-major from
# the quantizer (no per-call transpose), the f32->bf16 cast happens inside
# the kernel (no convert kernel), and block_m shrinks to the f32 sublane
# tile so tiny decode batches need no M padding. On the time-shared chip
# every eliminated kernel also saves its inter-kernel gap (~0.9 us,
# PERF.md), which is why the wrapper works this hard to emit nothing.
# --------------------------------------------------------------------------
def _int4_mm_planar_kernel(alo_ref, ahi_ref, p_ref, s_ref, out_ref,
                           *, qb: int, nbh: int):
    p = p_ref[:].astype(jnp.int32)  # [bn, Kh]
    lo = ((p & 0xF) - 8).astype(jnp.bfloat16)
    hi = ((p >> 4) - 8).astype(jnp.bfloat16)
    alo = alo_ref[:].astype(jnp.bfloat16)
    ahi = ahi_ref[:].astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for t in range(nbh):
        sl = slice(t * qb, (t + 1) * qb)
        dlo = jax.lax.dot_general(alo[:, sl], lo[:, sl], dn,
                                  preferred_element_type=jnp.float32)
        dhi = jax.lax.dot_general(ahi[:, sl], hi[:, sl], dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + dlo * s_ref[t:t + 1, :] + dhi * s_ref[nbh + t:
                                                          nbh + t + 1, :]
    out_ref[:] = acc


def planar_layout(K: int, block_size: int = 256):
    """The planar pack/kernel layout contract for a [K, N] weight:
    (nbh, bs) where bs is the per-half quant block width (block_size
    shrunk by powers of 2 until it divides K//2) and nbh = (K//2) / bs is
    the number of blocks per half. Scales are stored [2*nbh, N] k-major:
    lo-half rows then hi-half rows."""
    Kh = K // 2
    bs = max(1, min(block_size, Kh))
    while Kh % bs:
        bs //= 2
    return Kh // bs, bs


def int4_planar_supported(K: int, block_size: int = 256) -> bool:
    """True when the planar Pallas kernel handles this (K, block) layout:
    per-half quant blocks must be lane multiples (bs % 128 == 0) so the
    in-kernel block slices are aligned, and the whole K must fit one VMEM
    block (the kernel has no k-grid — weights' contraction dims are small;
    a [256, 16384] uint8 packed block is 4 MB, well under VMEM)."""
    if K % 2:
        return False
    nbh, bs = planar_layout(K, block_size)
    return bs % 128 == 0 and K // 2 <= 16384


@functools.partial(jax.jit, static_argnames=("qblock", "block_m", "block_n",
                                              "interpret"))
def qmatmul_int4_planar(
    a: jax.Array,        # f32/bf16 [M, K] activations (cast in-kernel)
    packed: jax.Array,   # uint8 [N, K//2] (quant.pack_int4_planar layout)
    scales: jax.Array,   # fp32 [2*nbh, N] k-major (lo rows then hi rows)
    *,
    qblock: int = 256,   # the block_size the weight was packed with
    block_m: int = 128,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Planar-packed int4 matmul -> f32 [M, N]."""
    M, K = a.shape
    N, Kh = packed.shape
    assert int4_planar_supported(K, qblock), \
        "planar int4 kernel needs per-half qblock % 128 == 0"
    nbh, qb = planar_layout(K, qblock)
    assert scales.shape[0] == 2 * nbh, (scales.shape, nbh)
    # f32 sublane tile is 8: decode batches (M=8) run unpadded
    sub = 16 if a.dtype == jnp.bfloat16 else 8
    block_m = min(block_m, _round_up(M, sub))

    Mp = _round_up(M, block_m)
    Np = _round_up(N, block_n)
    a2 = a if Mp == M else jnp.pad(a, ((0, Mp - M), (0, 0)))
    if Np != N:
        packed = jnp.pad(packed, ((0, Np - N), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        functools.partial(_int4_mm_planar_kernel, qb=qb, nbh=nbh),
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            # the SAME activation array twice: its block columns are the
            # contiguous halves of K (hi at column-block 1) — no slice,
            # pad, convert, or transpose ops are emitted around the call
            pl.BlockSpec((block_m, Kh), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, Kh), lambda i, j: (i, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, Kh), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            # all scale rows in one whole-rows block
            pl.BlockSpec((2 * nbh, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kh * 2,
            bytes_accessed=Mp * Kh * 8 + Np * Kh + Mp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a2, a2, packed, scales)
    return out[:M, :N]
