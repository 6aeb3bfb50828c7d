"""Fused tail-biting Viterbi Pallas kernel: all three trellis passes in
one VMEM-resident program.

The XLA decoder (models/convcode_jax._decode_one) runs three sequential
10-step `lax.scan`s over the 4-step-fused 64-state trellis; the joint
(start, current) pass's (B, 64, 64) f32 metric round-trips ~25 MB of
HBM per step at the MIB batch (B = 64 candidates x 4 frame timings x 3
port hypotheses = 768). This kernel keeps the metric, the replay
backpointers and the traceback state resident in VMEM for the whole
decode: per 128-lane batch tile only the (10, 12, 128) LLR chunks
stream in and the (40, 128) decoded bits stream out.

Identical math to the XLA path (reference trellis:
src/lte_lib.cpp:520-551 via IT++ decode_tailbite; exact ML over all 64
tail-biting starts):

  joint:    m[ss, s] = max_j m[ss, pred(s, j)] + adds[s*16+j]
  start  = argmax_ss m[ss, ss]
  replay:   m1[s], bps[t, s] = max/argmax_j ...   (same tie-breaking)
  traceback: j = bps[t, state]; bits = BITS[state, j];
             state = ((state << 4) & 63) | j

The K=4 chain structure makes every access STATIC: pred(s, j) =
((s << 4) & 63) | j, so with the 64 states stored as a (4, 16) sublane
block (p = c*16 + j), step s-groups read the full (4, 16) block and the
permuted write target [s // 16, s % 16] of each 4-wide s-group
{shi*4 + c} is the contiguous static slice [shi // 4, 4*(shi % 4):+4].
The branch-metric table is time-invariant, so each step's adds is one
(1024, 12) @ (12, 128) MXU pass; the traceback's bps[t, state] lookup
is a one-hot contraction (gathers are scalar-bound on TPU and
data-dependent sublane gathers do not lower in Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lte_cell_scanner_tpu.models.convcode import N_STATES
from lte_cell_scanner_tpu.models.convcode_jax import _chain_tables

_K = 4
_JK = 2 ** _K          # 16 chains per fused step
_NEG = np.float32(-1e30)   # unreachable-start sentinel (finite: avoids
                           # inf arithmetic in Mosaic; real path metrics
                           # are O(1e3), so it never wins a max)


@functools.lru_cache(maxsize=1)
def _tables():
    A, BITS = _chain_tables(_K)                    # (12, 1024), (64,16,4)
    a2 = np.ascontiguousarray(A.T).astype(np.float32)         # (1024, 12)
    bits_t = np.ascontiguousarray(
        BITS.reshape(N_STATES * _JK, _K).T).astype(np.float32)  # (4, 1024)
    return a2, bits_t


def _kernel(llr_ref, a2_ref, bitsT_ref, out_ref, ma_ref, mb_ref,
            m1_ref, bps_ref, diag_ref, *, n_steps: int):
    f32 = jnp.float32
    S, C, J = N_STATES, 4, _JK
    L = llr_ref.shape[-1]                          # lanes (batch tile)

    # ---- joint (start, current) metric pass: ma/mb ping-pong, both
    # stored (ss, c, j, lane) with current state s = c*16 + j.
    ss_i = jax.lax.broadcasted_iota(jnp.int32, (S, C, J, 1), 0)
    p_i = (jax.lax.broadcasted_iota(jnp.int32, (S, C, J, 1), 1) * J
           + jax.lax.broadcasted_iota(jnp.int32, (S, C, J, 1), 2))
    ma_ref[:] = jnp.where(ss_i == p_i, f32(0), _NEG) + jnp.zeros(
        (S, C, J, L), f32)
    bufs = (ma_ref, mb_ref)
    for t in range(n_steps):
        cur, nxt = bufs[t % 2], bufs[(t + 1) % 2]
        adds = jnp.dot(a2_ref[:], llr_ref[t],
                       preferred_element_type=f32)  # (1024, L)
        adds5 = adds.reshape(J, C, J, L)            # [shi, c, j, lane]
        m4 = cur[:]                                 # (S, C, J, L)
        for shi in range(J):
            # s-group {shi*4 + c}: new[ss, s] = max_j m[ss, c*16+j] +
            # adds[s*16+j]; its (4, 16)-layout home is the contiguous
            # static slice below (s//16 = shi//4, s%16 = 4*(shi%4)+c).
            cand = m4 + adds5[shi][None]            # (S, C, J, L)
            nxt[:, shi // 4, 4 * (shi % 4):4 * (shi % 4) + 4, :] = \
                jnp.max(cand, axis=2)               # (S, C, L)
    mfin = bufs[n_steps % 2]

    # ---- tail-biting start: argmax of the joint diagonal.
    for ss in range(S):
        diag_ref[ss, :] = mfin[ss, ss // J, ss % J, :]
    start = jnp.argmax(diag_ref[:], axis=0).astype(jnp.int32)  # (L,)
    start = start.reshape(1, L)

    # ---- single-start replay with per-step argmax backpointers.
    s_i = (jax.lax.broadcasted_iota(jnp.int32, (C, J, 1), 0) * J
           + jax.lax.broadcasted_iota(jnp.int32, (C, J, 1), 1))
    m1 = jnp.where(s_i == start[None], f32(0), _NEG) + jnp.zeros(
        (C, J, L), f32)
    for t in range(n_steps):
        adds = jnp.dot(a2_ref[:], llr_ref[t], preferred_element_type=f32)
        adds5 = adds.reshape(J, C, J, L)
        cand = m1[None] + adds5                     # (shi, C, J, L)
        bp = jnp.argmax(cand, axis=2)               # (shi, C, L)
        mx = jnp.max(cand, axis=2)
        for shi in range(J):
            # same permuted (4, 16)-layout home as the joint pass
            m1_ref[shi // 4, 4 * (shi % 4):4 * (shi % 4) + 4, :] = mx[shi]
            # bps rows in PLAIN s order (s = shi*4 + c): the traceback's
            # one-hot contraction indexes them by state value.
            bps_ref[t, 4 * shi:4 * shi + 4, :] = bp[shi].astype(f32)
        m1 = m1_ref[:]

    # ---- traceback (reverse time), bits via one-hot MXU contraction.
    state = start                                    # (1, L) int32
    si = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    sji = jax.lax.broadcasted_iota(jnp.int32, (S * J, L), 0)
    for t in range(n_steps - 1, -1, -1):
        oh_s = (si == state).astype(f32)             # (S, L)
        j = jnp.sum(oh_s * bps_ref[t], axis=0).reshape(1, L)
        j = j.astype(jnp.int32)
        idx = state * J + j                          # (1, L) in [0, 1024)
        oh = (sji == idx).astype(f32)                # (1024, L)
        out_ref[_K * t:_K * t + _K, :] = jnp.dot(
            bitsT_ref[:], oh, preferred_element_type=f32)   # (4, L)
        state = jnp.bitwise_and(state * J, S - 1) + j


def lte_conv_decode_pallas_tl(llr_tl: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """Time-major-layout entry: ``llr_tl`` (n_steps, 12, L) with L a
    multiple of 128 — row ti*3 + coded_bit of each 4-step chunk, the
    exact tile layout the kernel consumes. Callers that can produce it
    directly (ops/mib_jax feeds it straight out of the deratematch
    matmul with a row-permuted constant matrix) skip the (B, 3, n)
    relayout chain entirely. Returns (n, L) f32 bits (lanes = batch)."""
    n_steps, twelve, L_tot = llr_tl.shape
    assert twelve == _K * 3 and L_tot % 128 == 0
    n = n_steps * _K
    a2_np, bitsT_np = _tables()
    S, C, J, L = N_STATES, 4, _JK, 128

    return pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps),
        grid=(L_tot // L,),
        in_specs=[pl.BlockSpec((n_steps, _K * 3, L), lambda i: (0, 0, i)),
                  pl.BlockSpec((S * J, _K * 3), lambda i: (0, 0)),
                  pl.BlockSpec((_K, S * J), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((n, L), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n, L_tot), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, C, J, L), jnp.float32),   # ma
                        pltpu.VMEM((S, C, J, L), jnp.float32),   # mb
                        pltpu.VMEM((C, J, L), jnp.float32),      # m1
                        pltpu.VMEM((n_steps, S, L), jnp.float32),  # bps
                        pltpu.VMEM((S, L), jnp.float32)],        # diag
        # The 10 statically-unrolled trellis steps don't share stack
        # slots, so the scoped working set (~35 MB) exceeds the 16 MB
        # default; the v5e has 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(llr_tl, jnp.asarray(a2_np), jnp.asarray(bitsT_np))


def lte_conv_decode_pallas(d_llr: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Decode a batch: (B, 3, n) LLRs ln(P0/P1) -> (B, n) bits. n must
    be a multiple of 4 (the MIB's 40 always is); B is padded to the
    128-lane tile internally."""
    B, three, n = d_llr.shape
    assert three == 3 and n % _K == 0
    n_steps = n // _K
    x = d_llr.astype(jnp.float32)
    Bp = -(-B // 128) * 128
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, 3, n), jnp.float32)], axis=0)
    # (B, 3, n) -> (n_steps, 12, B): chunk-major rows i*3 + coded bit,
    # matching _chain_tables' A row order; batch on lanes.
    llr = jnp.moveaxis(x, 1, 2).reshape(Bp, n_steps, _K * 3)
    llr = jnp.transpose(llr, (1, 2, 0))
    bits = lte_conv_decode_pallas_tl(llr, interpret=interpret)
    return jnp.transpose(bits)[:B].astype(jnp.int32)
