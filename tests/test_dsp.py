import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import get_window as scipy_window

from golf_tpu.ops import dsp


def test_window_matches_torch_periodic():
    # torch.hann_window(n) == hann periodic
    w = dsp.get_window_fn("hanning")(8)
    n = np.arange(8)
    ref = 0.5 * (1 - np.cos(2 * np.pi * n / 8))
    np.testing.assert_allclose(w, ref, atol=1e-12)


def test_fir_filt_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 30)).astype(np.float32)
    h = rng.standard_normal((2, 30, 5)).astype(np.float32)
    y = dsp.fir_filt(jnp.asarray(x), jnp.asarray(h))
    # reference: pad left K-1, frames ending at n, dot with flipped h
    ref = np.zeros_like(x)
    for b in range(2):
        for n in range(30):
            acc = 0.0
            for k in range(5):
                idx = n - k
                if idx >= 0:
                    acc += h[b, n, k] * x[b, idx]
            ref[b, n] = acc
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_coeff_product():
    # (1 + 2x)(3 + x) = 3 + 7x + 2x^2
    polys = jnp.asarray([[[1.0, 2.0]], [[3.0, 1.0]]])  # (N=2, B=1, 2)
    prod = dsp.coeff_product(polys)
    np.testing.assert_allclose(prod, [[3.0, 7.0, 2.0]], atol=1e-5)


def test_biquads2lpc():
    bi = jnp.asarray([[[1.0, 0.5, 0.25], [1.0, -0.3, 0.1]]])  # (1, 2, 3)
    lpc = dsp.biquads2lpc(bi)
    ref = np.polymul([1, 0.5, 0.25], [1, -0.3, 0.1])[1:]
    np.testing.assert_allclose(lpc[0], ref, atol=1e-5)


def test_rc2lpc_stability():
    rng = np.random.default_rng(1)
    rc = jnp.tanh(jnp.asarray(rng.standard_normal((4, 3, 22))) * 0.7)
    a = dsp.rc2lpc(rc)
    roots_ok = []
    for flat in np.asarray(a).reshape(-1, 22):
        r = np.roots(np.concatenate([[1.0], flat]))
        # exact step-up is stable for |k|<1; allow fp32 rounding slack
        roots_ok.append(np.all(np.abs(r) < 1.0 + 1e-4))
    assert all(roots_ok)


def test_rc2lpc_matches_stepup():
    # order-2 closed form: a = [k0(1+k1), k1]
    rc = jnp.asarray([[[0.5, -0.3]]])
    a = dsp.rc2lpc(rc)
    np.testing.assert_allclose(a[0, 0], [0.5 * (1 - 0.3), -0.3], atol=1e-6)


def test_hilbert_matches_scipy():
    from scipy.signal import hilbert as scipy_hilbert
    rng = np.random.default_rng(2)
    x = rng.standard_normal(64)
    h = dsp.hilbert(jnp.asarray(x))
    ref = scipy_hilbert(x)
    np.testing.assert_allclose(np.asarray(h), ref, atol=1e-5)


def test_minimum_phase_fir_magnitude():
    # the min-phase kernel must preserve the target magnitude response
    rng = np.random.default_rng(3)
    log_mag = jnp.asarray(rng.standard_normal((1, 129)) * 0.5)
    k = dsp.minimum_phase_fir(log_mag)
    assert k.shape == (1, 256)
    mag = np.abs(np.fft.rfft(np.asarray(k[0])))
    np.testing.assert_allclose(mag, np.exp(np.asarray(log_mag[0])),
                               rtol=1e-3, atol=1e-4)
    # minimum phase -> energy front-loaded (zero-phase would be ~0.5)
    e_front = np.sum(np.asarray(k[0, :64]) ** 2)
    e_total = np.sum(np.asarray(k[0]) ** 2)
    assert e_front / e_total > 0.65


def test_zero_phase_fir_symmetric():
    log_mag = jnp.asarray(np.random.default_rng(4).standard_normal((1, 65)))
    k = dsp.zero_phase_fir(log_mag)
    assert k.shape == (1, 128)
    kk = np.asarray(k[0])
    # fftshifted zero-phase kernel: symmetric about index n/2
    np.testing.assert_allclose(kk[1:], kk[1:][::-1], atol=1e-5)


def test_lsp2lpc_roundtrip():
    # start from a stable polynomial, compute its LSPs with a reference
    # routine, convert back
    a_true = np.array([1.0, -0.9, 0.4, -0.1])
    p = len(a_true) - 1
    # reference LSP computation via root-finding on P/Q
    P = np.concatenate([a_true, [0]]) - np.concatenate([[0], a_true[::-1]])
    Q = np.concatenate([a_true, [0]]) + np.concatenate([[0], a_true[::-1]])
    angles = []
    for poly in (P, Q):
        r = np.roots(poly)
        ang = np.angle(r)
        ang = ang[(ang > 1e-9) & (ang < np.pi - 1e-9)]
        angles.extend(ang)
    w = np.sort(angles)
    assert len(w) == p
    lsp_in = jnp.asarray(np.concatenate([[0.0], w]))[None]
    a_rec = dsp.lsp2lpc(lsp_in)
    np.testing.assert_allclose(a_rec[0], a_true, atol=1e-5)


def test_radiation_filter():
    # unwindowed kernel is antisymmetric (differentiator-like); the
    # torch-style periodic window (as in the reference) breaks exact
    # antisymmetry, so test the raw kernel
    w = dsp.get_radiation_time_filter(8, None)
    assert w.shape == (17,)
    assert w[8] == 0
    np.testing.assert_allclose(w, -w[::-1], atol=1e-12)
    ww = dsp.get_radiation_time_filter(8, dsp.get_window_fn("hanning"))
    assert ww.shape == (17,)


@pytest.mark.slow
def test_levinson():
    from scipy.signal import lfilter as scipy_lfilter
    rng = np.random.default_rng(5)
    # AR(3) process
    a_true = np.array([1.0, -0.7, 0.2, -0.05])
    x = scipy_lfilter([1.0], a_true, rng.standard_normal(50000))
    r = np.correlate(x, x, "full")[len(x) - 1:len(x) + 3] / len(x)
    a_est = dsp.levinson(jnp.asarray(r), 3)
    np.testing.assert_allclose(a_est, a_true, atol=0.05)


def test_smooth_phase_offset():
    po = jnp.asarray([[0.1, 0.9, 0.05]])
    out = dsp.smooth_phase_offset(po)
    # diffs wrapped into [-0.5, 0.5]: 0.8 -> -0.2, -0.85 -> 0.15
    np.testing.assert_allclose(out[0], [0.1, -0.1, 0.05], atol=1e-6)


def test_fast_cumsum_matches_cumsum():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 10001)).astype(np.float32)
    out = np.asarray(dsp.fast_cumsum(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(out, np.cumsum(x, axis=1),
                               rtol=2e-4, atol=2e-3)
    # non-default axis
    x2 = rng.standard_normal((5, 700, 3)).astype(np.float32)
    out2 = np.asarray(dsp.fast_cumsum(jnp.asarray(x2), axis=1))
    np.testing.assert_allclose(out2, np.cumsum(x2, axis=1),
                               rtol=2e-4, atol=2e-3)


def test_decimate_fft_matches_direct():
    from golf_tpu.ops.resample import decimate_direct, decimate_fft
    rng = np.random.default_rng(11)
    for t in (10001, 4096):
        x = rng.standard_normal((2, t)).astype(np.float32)
        y_dir = np.asarray(decimate_direct(jnp.asarray(x), 4))
        y_fft = np.asarray(decimate_fft(jnp.asarray(x), 4))
        assert y_fft.shape[1] == -(-t // 4)
        np.testing.assert_allclose(y_dir, y_fft[:, :y_dir.shape[1]],
                                   atol=1e-4)


def test_decimate_poly_fft_matches_fft():
    """The default polyphase-FFT decimator is parity with the full-rate
    FFT path, including T % q != 0 (ADVICE r3)."""
    from golf_tpu.ops.resample import decimate_fft, decimate_poly_fft
    rng = np.random.default_rng(12)
    for q in (2, 4):
        for t in (4096, 10001, 3 * 1537):
            x = rng.standard_normal((2, t)).astype(np.float32)
            y_fft = np.asarray(decimate_fft(jnp.asarray(x), q))
            y_poly = np.asarray(decimate_poly_fft(jnp.asarray(x), q))
            assert y_poly.shape == y_fft.shape == (2, -(-t // q))
            np.testing.assert_allclose(y_poly, y_fft, atol=2e-5)


def test_decimate_custom_kernel_fallback():
    """decimate() accepts custom kernels whose half-width is not a
    q-multiple by falling back to the full-rate FFT path (ADVICE r3:
    the polyphase path's alignment assert must not be the public API)."""
    from golf_tpu.ops.resample import decimate, decimate_fft
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    kern = np.hanning(31).astype(np.float32)  # half=15, 15 % 4 != 0
    kern /= kern.sum()
    y = np.asarray(decimate(jnp.asarray(x), 4, kern))
    y_ref = np.asarray(decimate_fft(jnp.asarray(x), 4, kern))
    np.testing.assert_allclose(y, y_ref, atol=1e-6)


def test_fft_conv_full_overlap_save():
    from golf_tpu.ops.fftconv import fft_conv_full
    rng = np.random.default_rng(20)
    for t, taps, block in [(10000, 449, 2048), (500, 31, 8192)]:
        x = rng.standard_normal((2, t)).astype(np.float32)
        k = rng.standard_normal(taps).astype(np.float32)
        y = np.asarray(fft_conv_full(jnp.asarray(x), jnp.asarray(k), block))
        ref = np.stack([np.convolve(x[i], k, "full") for i in range(2)])
        np.testing.assert_allclose(y, ref, rtol=1e-4,
                                   atol=1e-4 * np.abs(ref).max())


def test_wrapped_cumsum_matches_fp64_mod1():
    """Blocked mod-1 phase integration: circularly equal to the fp64
    cumsum mod 1 with T-independent error, consistent under truncation,
    and exact for the integer-harmonic identity sin(2*pi*k*(c%1))."""
    from golf_tpu.ops.dsp import wrapped_cumsum
    rng = np.random.default_rng(0)
    for t in (19200, 19199, 240, 7):          # aligned / ragged / short
        x = rng.uniform(0.001, 0.05, (2, t)).astype(np.float32)
        w = np.asarray(wrapped_cumsum(jnp.asarray(x)))
        assert w.shape == x.shape and (w >= 0).all() and (w < 1).all()
        ref = np.cumsum(x.astype(np.float64), 1) % 1
        d = np.abs(w - ref)
        assert np.minimum(d, 1 - d).max() < 2e-5, t
    # long-signal conditioning: plain fp32 cumsum%1 degrades with T,
    # wrapped stays put (this is the property the oscillators rely on)
    xl = rng.uniform(0.001, 0.05, (1, 480000)).astype(np.float32)
    wl = np.asarray(wrapped_cumsum(jnp.asarray(xl)))
    refl = np.cumsum(xl.astype(np.float64), 1) % 1
    dl = np.abs(wl - refl)
    assert np.minimum(dl, 1 - dl).max() < 5e-5
    # gradient flows (mod-1 is piecewise-identity)
    g = jax.grad(lambda z: jnp.sum(
        jnp.sin(2 * np.pi * 3 * wrapped_cumsum(z))))(
        jnp.asarray(xl[:, :480]))
    assert bool(jnp.isfinite(g).all())


def test_wrapped_cumsum_custom_vjp_is_reverse_cumsum():
    """The custom VJP (reverse cumsum) equals the gradient of the plain
    unwrapped cumsum through any integer-periodic consumer (the mod-1
    wraps have unit slope a.e.)."""
    from golf_tpu.ops.dsp import wrapped_cumsum
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.001, 0.05, (3, 700)).astype(np.float32))

    def f_wrapped(z):
        return jnp.sum(jnp.cos(2 * np.pi * 2 * wrapped_cumsum(z))
                       * jnp.arange(z.shape[1]))

    gw = np.asarray(jax.grad(f_wrapped)(x))
    # analytic fp64 reference: df/dx_s = sum_{t>=s} w_t d cos(4 pi c_t)/dc
    c = np.cumsum(np.asarray(x, np.float64), axis=1)
    dldc = (-np.sin(4 * np.pi * c) * 4 * np.pi
            * np.arange(x.shape[1], dtype=np.float64))
    gp = np.flip(np.cumsum(np.flip(dldc, 1), axis=1), 1)
    np.testing.assert_allclose(gw, gp, rtol=1e-4, atol=5e-3 * np.abs(gp).max())
