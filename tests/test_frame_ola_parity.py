"""Golden parity for the frame-wise LPC + OLA pipeline.

Reference algorithm (``models/filters.py:131-184``), re-implemented here
step-by-step with numpy/scipy exactly as the torch code does it:
pad -> unfold(window, hop) -> per-frame constant-coefficient lfilter ->
conv_transpose1d against diag(window) -> divide by OLA of ones.
The framework's `LTVMinimumPhaseFilter` must match it sample-for-sample —
off-by-one frame alignment here dominated parity risk (SURVEY §7).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import lfilter as scipy_lfilter

from golf_tpu.core.sig import Sig
from golf_tpu.models.filters import LTVMinimumPhaseFilter
from golf_tpu.ops.dsp import get_window_fn, rc2lpc


def _reference_frame_ola(ex, gain_frames, a_frames, window, hop,
                         centred=True):
    """numpy transliteration of the reference torch algorithm."""
    b, t = ex.shape
    ws = len(window)
    padding = ws // 2

    x = ex if centred else ex[:, hop // 2:]
    # sample-rate gain: hop-upsampled (align_corners linear), truncated
    steps = gain_frames.shape[1]
    up_len = (steps - 1) * hop + 1
    tq = np.arange(up_len) / hop
    gain_up = np.stack([np.interp(tq, np.arange(steps), gain_frames[i])
                        for i in range(b)])
    n = min(x.shape[1], gain_up.shape[1])
    x = x[:, :n] * gain_up[:, :n]

    xp = np.pad(x, ((0, 0), (padding, padding)))
    n_frames = (xp.shape[1] - ws) // hop + 1
    frames = np.stack([xp[:, i * hop:i * hop + ws]
                       for i in range(n_frames)], axis=1)  # (B, F, ws)
    f = min(n_frames, a_frames.shape[1])
    frames = frames[:, :f]

    filtered = np.zeros_like(frames)
    for bi in range(b):
        for fi in range(f):
            a_full = np.concatenate([[1.0], a_frames[bi, fi]])
            filtered[bi, fi] = scipy_lfilter([1.0], a_full, frames[bi, fi])

    out_len = (f - 1) * hop + ws
    y = np.zeros((b, out_len))
    norm = np.zeros(out_len)
    for fi in range(f):
        y[:, fi * hop:fi * hop + ws] += filtered[:, fi] * window
        norm[fi * hop:fi * hop + ws] += window
    y = y[:, padding:-padding]
    norm = norm[padding:-padding]
    y = y / norm
    if not centred:
        # reflect-pad hop//2 on the left (torch F.pad 'reflect')
        left = y[:, 1:hop // 2 + 1][:, ::-1]
        y = np.concatenate([left, y], axis=1)
    return y


def test_frame_ola_matches_reference_transliteration():
    rng = np.random.default_rng(0)
    b, t, hop, p, ws = 2, 1920, 96, 6, 384
    ex = rng.standard_normal((b, t)).astype(np.float32)
    frames = t // hop
    gain = np.exp(rng.standard_normal((b, frames)).astype(np.float32) * 0.2)
    rc = np.tanh(rng.standard_normal((b, frames, p)).astype(np.float32)
                 * 0.3)
    a = np.asarray(rc2lpc(jnp.asarray(rc)))

    window = np.asarray(get_window_fn("hanning")(ws))

    ref = _reference_frame_ola(ex, gain, a, window, hop, centred=True)

    filt = LTVMinimumPhaseFilter(window="hanning", window_length=ws,
                                 lpc_order=p)
    variables = filt.init({"params": jax.random.key(0)},
                          Sig(jnp.asarray(ex), 1),
                          Sig(jnp.asarray(gain), hop),
                          Sig(jnp.asarray(a), hop))
    out = filt.apply(variables, Sig(jnp.asarray(ex), 1),
                     Sig(jnp.asarray(gain), hop), Sig(jnp.asarray(a), hop))
    got = np.asarray(out.data)
    n = min(got.shape[1], ref.shape[1])
    np.testing.assert_allclose(got[:, :n], ref[:, :n], rtol=1e-3,
                               atol=1e-4)


def test_frame_ola_matches_reference_non_centred():
    rng = np.random.default_rng(1)
    b, t, hop, p, ws = 1, 960, 96, 4, 192
    ex = rng.standard_normal((b, t)).astype(np.float32)
    frames = t // hop
    gain = np.ones((b, frames), np.float32)
    rc = np.tanh(rng.standard_normal((b, frames, p)).astype(np.float32)
                 * 0.2)
    a = np.asarray(rc2lpc(jnp.asarray(rc)))
    window = np.asarray(get_window_fn("hanning")(ws))
    ref = _reference_frame_ola(ex, gain, a, window, hop, centred=False)
    filt = LTVMinimumPhaseFilter(window="hanning", window_length=ws,
                                 lpc_order=p, centred=False)
    variables = filt.init({"params": jax.random.key(0)},
                          Sig(jnp.asarray(ex), 1),
                          Sig(jnp.asarray(gain), hop),
                          Sig(jnp.asarray(a), hop))
    out = filt.apply(variables, Sig(jnp.asarray(ex), 1),
                     Sig(jnp.asarray(gain), hop), Sig(jnp.asarray(a), hop))
    got = np.asarray(out.data)
    n = min(got.shape[1], ref.shape[1])
    np.testing.assert_allclose(got[:, :n], ref[:, :n], rtol=1e-3,
                               atol=1e-4)


def test_samplewise_precise_matches_transliteration():
    """GOLF-ss: gain broadcast + coefficient hop-upsampling + sample-wise
    recurrence (reference filters.py:99-113 + torchlpc semantics)."""
    from golf_tpu.models.filters import LTVMinimumPhaseFilterPrecise
    rng = np.random.default_rng(2)
    b, t, hop, p = 1, 960, 96, 4
    ex = rng.standard_normal((b, t)).astype(np.float32)
    frames = t // hop
    gain = np.exp(rng.standard_normal((b, frames)).astype(np.float32) * 0.2)
    rc = np.tanh(rng.standard_normal((b, frames, p)).astype(np.float32)
                 * 0.3)
    a = np.asarray(rc2lpc(jnp.asarray(rc)))

    # numpy reference
    up_len = (frames - 1) * hop + 1
    tq = np.arange(up_len) / hop
    g_up = np.interp(tq, np.arange(frames), gain[0])
    a_up = np.stack([np.interp(tq, np.arange(frames), a[0, :, j])
                     for j in range(p)], -1)
    n = min(t, up_len)
    x = ex[0, :n] * g_up[:n]
    y_ref = np.zeros(n)
    for i in range(n):
        acc = x[i]
        for j in range(1, p + 1):
            if i - j >= 0:
                acc -= a_up[i, j - 1] * y_ref[i - j]
        y_ref[i] = acc

    filt = LTVMinimumPhaseFilterPrecise(lpc_order=p)
    variables = filt.init({"params": jax.random.key(0)},
                          Sig(jnp.asarray(ex), 1),
                          Sig(jnp.asarray(gain), hop),
                          Sig(jnp.asarray(a), hop))
    out = filt.apply(variables, Sig(jnp.asarray(ex), 1),
                     Sig(jnp.asarray(gain), hop), Sig(jnp.asarray(a), hop))
    got = np.asarray(out.data[0])
    m = min(len(got), n)
    np.testing.assert_allclose(got[:m], y_ref[:m], rtol=1e-3, atol=1e-4)
