"""Fused symbol-demod Pallas kernel vs the XLA stream-demod path.

The kernel (ops/fd_demod_pallas.py) fuses the aligned-row blend, FOC
rotation, 128->72 DFT and fractional-timing/bulk-phase compensation of
the tracker's get_fd (reference: src/tracker_thread.cpp:91-174) into one
VMEM pass. These tests check it against the composable XLA formulation
(_aligned_wins + get_fd_batch) in interpret mode on CPU; on TPU the two
are bit-identical (same MXU dots), verified by the engine using it as
the default stream-mode path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lte_cell_scanner_tpu.ops.fd_demod_pallas import (fd_demod_pallas,
                                                      planar_rows)
from lte_cell_scanner_tpu.ops.sync_jax import _aligned_wins
from lte_cell_scanner_tpu.tracker import batch_frontend as bf


def _random_case(rng, n_win, n_samp):
    seg = rng.integers(0, 256, size=(n_samp, 2), dtype=np.uint8)
    starts = rng.integers(0, n_samp - 128, size=n_win).astype(np.int32)
    foc = rng.normal(scale=1e-3, size=n_win).astype(np.float32)
    bpo = rng.uniform(-np.pi, np.pi, size=n_win).astype(np.float32)
    late = rng.uniform(-2, 2, size=n_win).astype(np.float32)
    return seg, starts, foc, bpo, late


def _xla_reference(seg, starts, foc, bpo, late):
    x = (jnp.asarray(seg).astype(jnp.float32) - 127.0) * (1.0 / 128.0)
    g, j, b = _aligned_wins(x, jnp.asarray(starts))
    return np.asarray(bf.get_fd_batch(
        g, jnp.asarray(foc), jnp.asarray(bpo),
        jnp.asarray(late) - b.astype(jnp.float32), j=j))


def test_kernel_matches_xla_stream_demod():
    rng = np.random.default_rng(7)
    seg, starts, foc, bpo, late = _random_case(rng, n_win=300, n_samp=6000)
    want = _xla_reference(seg, starts, foc, bpo, late)
    got = np.asarray(fd_demod_pallas(
        *planar_rows(jnp.asarray(seg), jnp.asarray(starts)),
        jnp.asarray(foc), jnp.asarray(bpo), jnp.asarray(late),
        interpret=True))
    assert got.shape == (300, 72, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_kernel_unaligned_window_count_pads():
    """N not a multiple of the kernel tile must round-trip unchanged."""
    rng = np.random.default_rng(11)
    seg, starts, foc, bpo, late = _random_case(rng, n_win=37, n_samp=2048)
    want = _xla_reference(seg, starts, foc, bpo, late)
    got = np.asarray(fd_demod_pallas(
        *planar_rows(jnp.asarray(seg), jnp.asarray(starts)),
        jnp.asarray(foc), jnp.asarray(bpo), jnp.asarray(late),
        interpret=True))
    assert got.shape == (37, 72, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_planar_rows_matches_aligned_wins_blend():
    """The u8 row gather must reproduce _aligned_wins' blended window."""
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 256, size=(1000, 2), dtype=np.uint8)
    starts = rng.integers(0, 1000 - 128, size=64).astype(np.int32)
    x = (jnp.asarray(seg).astype(jnp.float64) - 127.0) / 128.0
    g, j, b_want = _aligned_wins(x, jnp.asarray(starts))
    yr, yi, yr2, yi2, b = planar_rows(jnp.asarray(seg), jnp.asarray(starts))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(b_want))
    lane = np.arange(128)[None, :]
    mask = lane >= np.asarray(b)[:, None]
    gr = np.where(mask, np.asarray(yr), np.asarray(yr2))
    gi = np.where(mask, np.asarray(yi), np.asarray(yi2))
    blended = (np.stack([gr, gi], axis=-1).astype(np.float64) - 127.0) / 128.0
    np.testing.assert_allclose(blended, np.asarray(g), atol=1e-12)


def test_engine_pallas_stream_path_matches_xla():
    """_demod_stream_pallas_jit == _demod_stream_jit on the full engine
    program (symbols + CE + sync measurements), interpret mode."""
    from lte_cell_scanner_tpu.tracker import batch_runtime as br

    rng = np.random.default_rng(19)
    C, S, R, Q, K, P = 2, 16, 4, 4, 2, 2
    seg = rng.integers(0, 256, size=(4096, 2), dtype=np.uint8)
    starts = rng.integers(0, 4096 - 256, size=(C, S)).astype(np.int32)
    foc = rng.normal(scale=1e-3, size=(C, S)).astype(np.float32)
    bpo = rng.uniform(-np.pi, np.pi, size=(C, S)).astype(np.float32)
    late = rng.uniform(-2, 2, size=(C, S)).astype(np.float32)
    rs_conj_tab = rng.normal(size=(C, 20, 2, 12, 2)).astype(np.float32)
    shift_tab = rng.integers(0, 6, size=(C, 20, 2, P)).astype(np.int32)
    rs_idx = rng.integers(0, S, size=(C, R)).astype(np.int32)
    rs_slot = rng.integers(0, 20, size=(C, R)).astype(np.int32)
    rs_sym = rng.integers(0, 2, size=(C, R)).astype(np.int32)
    keep_idx = rng.integers(0, S, size=(C, Q)).astype(np.int32)
    pair_idx = np.sort(
        rng.integers(0, S, size=(C, K, 2)).astype(np.int32), axis=-1)
    pair_sel = rng.integers(0, 2, size=(C, K)).astype(np.int32)
    pss_conj = rng.normal(size=(C, 62, 2)).astype(np.float32)
    sss_tab = rng.choice([-1.0, 1.0], size=(C, 2, 62)).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (
        foc, bpo, late, rs_conj_tab, shift_tab, rs_idx, rs_slot, rs_sym,
        keep_idx, pair_idx, pair_sel, pss_conj, sss_tab))
    flat_x, ce_x = br._demod_stream_jit(
        jnp.asarray(seg), jnp.asarray(starts), *args)
    flat_p, ce_p = br._demod_stream_pallas_jit(
        jnp.asarray(seg), jnp.asarray(starts), *args, interpret=True)
    np.testing.assert_allclose(np.asarray(ce_p), np.asarray(ce_x),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_x),
                               rtol=2e-2, atol=2e-3)
