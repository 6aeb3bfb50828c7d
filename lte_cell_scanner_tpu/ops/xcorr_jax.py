"""Device (JAX/XLA) implementation of the PSS hypothesis scan.

The reference's hot loop (src/searcher.cpp:113-174: ~2e10 complex MACs per
80 ms capture at ppm=100, OpenMP over lags) maps onto the TPU MXU as ONE
convolution:

- the complex correlation of 3 PSS x n_f frequency hypotheses is expressed
  as a 2-input-channel real convolution with 2*3*n_f output channels
  (re/im of each template), which XLA lowers to im2col matmuls on the
  128x128 systolic array;
- the per-hypothesis incoherent k_factor folding is a batched gather + mean;
- delay-spread smoothing, the sliding power estimate (reduce_window) and
  the frequency collapse fuse into the same jit.

Everything from raw capture to the collapsed (3, 9600) peak tables runs in
one XLA program; only the tiny greedy peak extraction stays on host.

The device program is pure REAL arithmetic: complex dtypes are avoided
entirely (the TPU backend in this environment does not materialize complex
arrays, and split re/im planes are the faster layout on TPU anyway). The
frequency-shifted templates and the k_factor fold indices are precomputed
on host in float64 and passed in as arrays, so device results track the
float64 reference to f32 rounding only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lte_cell_scanner_tpu.constants import HALF_FRAME, PSS_TD_LEN
from lte_cell_scanner_tpu.ops.xcorr import (
    XcorrResult,
    fold_start_indices,
    n_comb_xc_for,
    shifted_templates,
)


def correlate_conv(cap_ri: jnp.ndarray, tpl_re: jnp.ndarray,
                   tpl_im: jnp.ndarray):
    """All-hypothesis PSS correlation as one MXU matmul.

    cap_ri: (n_cap, 2) float. tpl_re/tpl_im: (n_ch, 137) float with
    n_ch = 3*n_f (channel c = foi*3 + t).
    Returns (xc_re, xc_im), each (n_ch, n_lags).

    The sliding window is materialized as 137 static slices of the capture
    stacked into a (2*137, n_lags) matrix (re plane over im plane); the
    whole hypothesis bank then correlates in a single
    (2*n_ch, 2*137) @ (2*137, n_lags) matmul. XLA lowers a 153k-point 1-D
    convolution poorly on TPU (minutes of compile, ~0.2 TFLOP/s); this
    explicit im2col form compiles in seconds and keeps the MXU busy.
    """
    rdt = cap_ri.dtype
    n_cap = cap_ri.shape[0]
    n_lags = n_cap - (PSS_TD_LEN - 1)
    n_ch = tpl_re.shape[0]
    # (137, n_lags) shifted views of each plane.
    x_re = jnp.stack([jax.lax.dynamic_slice_in_dim(cap_ri[:, 0], m, n_lags)
                      for m in range(PSS_TD_LEN)])
    x_im = jnp.stack([jax.lax.dynamic_slice_in_dim(cap_ri[:, 1], m, n_lags)
                      for m in range(PSS_TD_LEN)])
    x = jnp.concatenate([x_re, x_im], axis=0)          # (274, n_lags)
    # Complex correlate: re = tr*ar - ti*ai ; im = ti*ar + tr*ai.
    f = jnp.block([[tpl_re, -tpl_im], [tpl_im, tpl_re]]).astype(rdt)
    out = jnp.dot(f, x, preferred_element_type=rdt)    # (2*n_ch, n_lags)
    return out[:n_ch], out[n_ch:]


def _fold(mag2: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Incoherent fold (3*n_f, n_lags) -> (3, 9600, n_f) with per-hypothesis
    fold start indices (n_f, n_comb_xc).

    Implemented as batched contiguous dynamic slices (one per fold), not an
    element gather: TPU slice-DMAs are ~10x faster here and compile in
    under a second vs ~30 s for the gather form.
    """
    n_f = mag2.shape[0] // 3
    n_comb_xc = starts.shape[1]
    m3 = mag2.reshape(n_f, 3, -1)
    slice_f = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice_in_dim(row, st, HALF_FRAME, axis=1))
    acc = slice_f(m3, starts[:, 0])
    for k in range(1, n_comb_xc):
        acc = acc + slice_f(m3, starts[:, k])
    return jnp.transpose(acc / n_comb_xc, (1, 2, 0))       # (3, 9600, n_f)


def _delay_spread(single: jnp.ndarray, ds_comb_arm: int) -> jnp.ndarray:
    out = single
    for t in range(1, ds_comb_arm + 1):
        out = out + jnp.roll(single, t, axis=1) + jnp.roll(single, -t, axis=1)
    return out / (2 * ds_comb_arm + 1)


def _sp_est(cap_ri: jnp.ndarray, n_comb_sp: int) -> jnp.ndarray:
    """Sliding 274-sample mean power folded into one half-frame."""
    return _sp_est_from_pw(cap_ri[:, 0] ** 2 + cap_ri[:, 1] ** 2, n_comb_sp)


def win_sum(x, w):
    """Sliding w-window sum by length doubling: S_{a+b}[k] = S_a[k] +
    S_b[k+a] — O(log w) vector adds, numerically a balanced tree (NOT
    reduce_window, which takes minutes to compile and dominates runtime
    on TPU at this window size; and NOT a cumsum difference, which loses
    float32 accuracy over 144k samples)."""
    memo = {1: x}

    def s(n):
        if n not in memo:
            h = n // 2
            a, b = s(h), s(n - h)
            ln = x.shape[0] - n + 1
            memo[n] = a[:ln] + jax.lax.dynamic_slice_in_dim(b, h, ln)
        return memo[n]

    return s(w)


def _sp_est_from_pw(pw: jnp.ndarray, n_comb_sp: int) -> jnp.ndarray:
    n_sp = n_comb_sp * HALF_FRAME
    sp = win_sum(pw, 274)[:n_sp] / 274.0
    sp_inc = sp.reshape(n_comb_sp, HALF_FRAME).mean(axis=0)
    return jnp.roll(sp_inc, 137)


def _xcorr_core(cap_ri, tpl_re, tpl_im, starts, n_comb_sp, ds_comb_arm):
    """The full device program for ONE capture. All-real; see module doc.

    Returns (packed (7, 9600), single, inc): packed rows 0-2 are the
    collapsed peak powers, rows 3-5 the argmax hypothesis indices (as
    floats), row 6 the folded signal power — one array so the host needs a
    single transfer for the peak scan.
    """
    xc_re, xc_im = correlate_conv(cap_ri, tpl_re, tpl_im)
    mag2 = xc_re * xc_re + xc_im * xc_im
    # Materialize the correlation before the fold: without the barrier XLA
    # fuses (= recomputes) the big matmul into each of the n_comb_xc slice
    # consumers, blowing up both compile and run time.
    mag2 = jax.lax.optimization_barrier(mag2)
    single = _fold(mag2, starts)
    inc = _delay_spread(single, ds_comb_arm)
    sp_inc = _sp_est(cap_ri, n_comb_sp)
    pow_ = inc.max(axis=2)
    frq = inc.argmax(axis=2).astype(pow_.dtype)
    packed = jnp.concatenate([pow_, frq, sp_inc[None, :]], axis=0)
    return packed, single, inc


xcorr_pss_core = functools.partial(jax.jit, static_argnames=(
    "n_comb_sp", "ds_comb_arm"))(_xcorr_core)

# Batched over a leading captures axis: the fc sweep scans many captures in
# one dispatch, amortizing tunnel latency and keeping the MXU busy.
xcorr_pss_core_batch = functools.partial(jax.jit, static_argnames=(
    "n_comb_sp", "ds_comb_arm"))(jax.vmap(
        _xcorr_core, in_axes=(0, None, None, None, None, None),
        axis_name="capture"))


def xcorr_pss_jax(capbuf, f_search_set, ds_comb_arm, fc_requested,
                  fc_programmed, fs_programmed, dtype=None,
                  use_pallas=None) -> XcorrResult:
    """Device PSS scan; mirrors ops.xcorr.xcorr_pss(backend='numpy').

    use_pallas: route correlate+fold through the fused Pallas kernel
    (ops/xcorr_pallas.py). Default: on for TPU-like backends, off for CPU
    (where the XLA path runs in float64 for golden-parity testing).
    """
    if dtype is None:
        dtype = (np.float64
                 if jax.config.jax_enable_x64 and jax.default_backend() == "cpu"
                 else np.float32)
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    capbuf = np.asarray(capbuf)
    f_search_set = np.asarray(f_search_set, dtype=np.float64)
    n_cap = capbuf.shape[0]
    n_lags = n_cap - (PSS_TD_LEN - 1)
    n_comb_xc = n_comb_xc_for(n_lags, f_search_set, fc_requested,
                              fc_programmed, fs_programmed)
    n_comb_sp = (n_cap - 136 - 137) // HALF_FRAME

    if use_pallas:
        from lte_cell_scanner_tpu.ops.xcorr_pallas import (pad_capture,
                                                           scan_plan,
                                                           xcorr_core_pallas)

        bank, bases, offs, halo, n_tile, _, pad_len = scan_plan(
            n_cap, f_search_set, fc_requested, fc_programmed, fs_programmed)
        cap2 = pad_capture(
            np.stack([capbuf.real, capbuf.imag]).astype(np.float32), pad_len)
        packed, single, inc = xcorr_core_pallas(
            jnp.asarray(cap2), jnp.asarray(bank), jnp.asarray(bases),
            None if offs is None else jnp.asarray(offs),
            n_comb_xc, n_comb_sp, ds_comb_arm,
            halo=halo, n_tile=n_tile)
        packed = np.asarray(packed, dtype=np.float64)
        return XcorrResult(
            xc_incoherent_collapsed_pow=packed[0:3],
            xc_incoherent_collapsed_frq=packed[3:6].astype(np.int64),
            xc_incoherent_single=_LazyArray(single),
            xc_incoherent=_LazyArray(inc),
            sp_incoherent=packed[6],
            n_comb_xc=int(n_comb_xc),
            n_comb_sp=int(n_comb_sp),
        )

    cap_ri = np.stack([capbuf.real, capbuf.imag], axis=-1).astype(dtype)
    tpl = shifted_templates(f_search_set, fc_requested, fc_programmed,
                            fs_programmed)                  # (n_f, 3, 137) c128
    tpl = tpl.reshape(-1, PSS_TD_LEN)
    starts = fold_start_indices(f_search_set, n_comb_xc, fc_requested,
                                fc_programmed, fs_programmed).astype(np.int32)

    packed, single, inc = xcorr_pss_core(
        jnp.asarray(cap_ri), jnp.asarray(tpl.real.astype(dtype)),
        jnp.asarray(tpl.imag.astype(dtype)), jnp.asarray(starts),
        n_comb_sp, ds_comb_arm)

    # Fetch only what the threshold + peak scan need up front (one ~270 KB
    # transfer); the full (3, 9600, n_f) tables stay on device behind lazy
    # handles — host<->device transfers dominate wall clock in this
    # deployment, and most scans find no peaks and never touch them.
    packed = np.asarray(packed, dtype=np.float64)
    return XcorrResult(
        xc_incoherent_collapsed_pow=packed[0:3],
        xc_incoherent_collapsed_frq=packed[3:6].astype(np.int64),
        xc_incoherent_single=_LazyArray(single),
        xc_incoherent=_LazyArray(inc),
        sp_incoherent=packed[6],
        n_comb_xc=int(n_comb_xc),
        n_comb_sp=int(n_comb_sp),
    )


class _LazyArray:
    """Device-array handle that fetches to host numpy on first indexing."""

    def __init__(self, dev):
        self._dev = dev
        self._np = None

    def _materialize(self):
        if self._np is None:
            self._np = np.asarray(self._dev, dtype=np.float64)
        return self._np

    def __getitem__(self, key):
        return self._materialize()[key]

    def __array__(self, dtype=None, copy=None):
        arr = self._materialize()
        return arr.astype(dtype) if dtype is not None else arr

    @property
    def shape(self):
        return self._dev.shape
