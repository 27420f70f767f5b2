"""Exact-causal streaming encoder parity (serve/enc_stream.py).

The contract: rows emitted by ``flush`` equal the offline encoder
bit-for-bit (the stream reproduces the offline STFT/conv edge padding and
the offline backward-LSTM zero init at the true utterance end); rows
emitted mid-stream differ only by the backward-LSTM truncation, which
decays with the lookahead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.core.sig import Sig
from golf_tpu.serve.enc_stream import StreamingEncoder, backward_decay
from golf_tpu.tasks.ae import build_encoder


def _make_encoder(num_layers=2, channels=(8, 16), strides=(4, 4),
                  **backbone_kwargs):
    split_sizes = ((6,), (4, 3))
    args_keys = ("alpha_params", "beta_params")
    enc = build_encoder(
        "models.enc.VocoderParameterEncoderInterface",
        {"f0_min": 60.0, "f0_max": 1000.0,
         "backbone_type": "models.unet.UNetEncoder",
         "n_fft": 512, "hop_length": 240, "channels": list(channels),
         "strides": list(strides), "lstm_hidden_size": 24,
         "num_layers": num_layers, "dropout": 0.0,
         "learn_voicing": True, "learn_f0": False, **backbone_kwargs},
        split_sizes, args_keys)
    return enc


def _inputs(b=2, t=24000, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)
    f0 = (200.0 + 40.0 * np.sin(np.linspace(0, 6.0, t))[None, :]
          * np.ones((b, 1))).astype(np.float32)
    return x, f0


def _init(enc, x, f0):
    vs = jax.jit(lambda xs, f0s: enc.init(
        {"params": jax.random.key(0)}, Sig(xs, 1), Sig(f0s, 1),
        train=False))(x, f0)
    vs = dict(vs)
    # randomize ALL params: the head is zero-initialized by design, so
    # parity on the init params would be vacuously exact
    leaves, treedef = jax.tree_util.tree_flatten(vs["params"])
    r = np.random.default_rng(42)
    vs["params"] = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(r.standard_normal(
            l.shape).astype(np.float32) * 0.1) for l in leaves])
    # non-degenerate normalization stats (init leaves inf placeholders)
    vs["stats"] = {"backbone": {
        "log_spec_min": jnp.asarray(-18.0),
        "log_spec_max": jnp.asarray(2.0)}}
    return vs


def _offline_raw(enc, vs, x, f0):
    return jax.jit(lambda xs, f0s: enc.apply(
        vs, Sig(xs, 1), Sig(f0s, 1), train=False))(x, f0)


def _stream_raw(enc, vs, x, f0, lookahead, chunk=2400):
    se = StreamingEncoder(enc, vs, lookahead=lookahead, batch=x.shape[0])
    outs = []
    for s in range(0, x.shape[1], chunk):
        r = se.push(x[:, s:s + chunk], f0[:, s:s + chunk])
        if r is not None:
            outs.append(r)
    r = se.flush()
    n_flushed = 0
    if r is not None:
        outs.append(r)
        n_flushed = _first_leaf(r).data.shape[1]
    cat = {}
    for k in outs[0]:
        if isinstance(outs[0][k], tuple):
            cat[k] = tuple(
                Sig(jnp.concatenate([np.asarray(o[k][i].data)
                                     for o in outs], axis=1),
                    outs[0][k][i].hop)
                for i in range(len(outs[0][k])))
        else:
            cat[k] = Sig(jnp.concatenate(
                [np.asarray(o[k].data) for o in outs], axis=1),
                outs[0][k].hop)
    return cat, n_flushed


def _first_leaf(group):
    v = next(iter(group.values()))
    return v[0] if isinstance(v, tuple) else v


def _leaves(raw):
    out = {}
    for k, v in raw.items():
        if isinstance(v, tuple):
            for i, s in enumerate(v):
                out[f"{k}[{i}]"] = np.asarray(s.data)
        else:
            out[k] = np.asarray(v.data)
    return out


@pytest.mark.parametrize("num_layers", [1, 2])
def test_stream_encoder_parity(num_layers):
    enc = _make_encoder(num_layers=num_layers)
    x, f0 = _inputs()
    vs = _init(enc, x, f0)
    ref = _leaves(_offline_raw(enc, vs, x, f0))

    L = 24
    got, n_flushed = _stream_raw(enc, vs, x, f0, lookahead=L)
    got = _leaves(got)
    assert set(got) == set(ref)
    n = ref[next(iter(ref))].shape[1]
    for k in ref:
        assert got[k].shape == ref[k].shape, (k, got[k].shape,
                                              ref[k].shape)
        scale = np.abs(ref[k]).max() + 1e-9
        # flushed tail rows are exact up to fp reassociation: the window
        # STFT/conv run on different array extents than offline, so XLA
        # may tile/reassociate differently (observed ~3e-5 after the
        # LayerNorm+LSTM chain); there is NO truncation error here
        tail = np.abs(got[k][:, n - n_flushed:]
                      - ref[k][:, n - n_flushed:]).max() / scale
        assert tail < 1e-4, (k, tail)
        # mid-stream rows: backward truncation only — small at L=24
        mid = np.abs(got[k] - ref[k]).max() / scale
        assert mid < 2e-2, (k, mid)

    # error decays with lookahead
    got8 = _leaves(_stream_raw(enc, vs, x, f0, lookahead=6)[0])
    worst_L = max(np.abs(got[k] - ref[k]).max()
                  / (np.abs(ref[k]).max() + 1e-9) for k in ref)
    worst_8 = max(np.abs(got8[k] - ref[k]).max()
                  / (np.abs(ref[k]).max() + 1e-9) for k in ref)
    assert worst_L <= worst_8 + 1e-9, (worst_L, worst_8)


def test_stream_encoder_lru_one_push_exact():
    """LRU backbone, whole utterance in one push + flush: the zi
    predictor then sees the utterance's true last frame (exactly like
    offline, reference models/unet.py:69-77), so every emitted row is
    exact up to fp reassociation."""
    enc = _make_encoder(num_layers=2, use_lru=True)
    x, f0 = _inputs(b=1, t=24000)
    vs = _init(enc, x, f0)
    ref = _leaves(_offline_raw(enc, vs, x, f0))
    # lookahead > total frames: nothing emits on push; flush emits all
    got, n_flushed = _stream_raw(enc, vs, x, f0, lookahead=10 ** 6,
                                 chunk=x.shape[1])
    got = _leaves(got)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == ref[k].shape, (k, got[k].shape,
                                              ref[k].shape)
        scale = np.abs(ref[k]).max() + 1e-9
        err = np.abs(got[k] - ref[k]).max() / scale
        assert err < 1e-4, (k, err)


def test_stream_encoder_lru_chunked():
    """Chunked LRU streaming: the recurrence state is carried exactly, so
    the only deviation is the first chunk's predicted carry-in, whose
    influence decays as |lambda|^t — later rows must be tighter than the
    stream's worst row, and everything within a small global bound."""
    enc = _make_encoder(num_layers=1, use_lru=True)
    x, f0 = _inputs(b=1, t=24000)
    vs = _init(enc, x, f0)
    ref = _leaves(_offline_raw(enc, vs, x, f0))
    got, _ = _stream_raw(enc, vs, x, f0, lookahead=8)
    got = _leaves(got)
    n = ref[next(iter(ref))].shape[1]
    for k in ref:
        assert got[k].shape == ref[k].shape
        scale = np.abs(ref[k]).max() + 1e-9
        err_rows = np.abs(got[k] - ref[k]).max(
            axis=tuple(i for i in range(got[k].ndim) if i != 1)) / scale
        assert err_rows.max() < 2e-2, (k, err_rows.max())
        # second half strictly tighter than the global worst (decay)
        assert err_rows[n // 2:].max() <= err_rows.max() + 1e-12
        assert err_rows[n // 2:].max() < 1e-3, (k, err_rows[n // 2:].max())


def test_stream_encoder_env_features():
    """Env-features variant (include_env_features=True): the
    harmonic/noise envelopes are frame-local and shared with the offline
    path (models.unet.env_features), so the flush contract is unchanged."""
    enc = _make_encoder(num_layers=1, sample_rate=24000,
                        include_env_features=True, num_harmonics=64)
    x, f0 = _inputs(b=1, t=24000)
    vs = _init(enc, x, f0)
    ref = _leaves(_offline_raw(enc, vs, x, f0))
    got, n_flushed = _stream_raw(enc, vs, x, f0, lookahead=24)
    got = _leaves(got)
    assert set(got) == set(ref)
    n = ref[next(iter(ref))].shape[1]
    assert n_flushed > 0
    for k in ref:
        assert got[k].shape == ref[k].shape, (k, got[k].shape,
                                              ref[k].shape)
        scale = np.abs(ref[k]).max() + 1e-9
        tail = np.abs(got[k][:, n - n_flushed:]
                      - ref[k][:, n - n_flushed:]).max() / scale
        assert tail < 1e-4, (k, tail)
        mid = np.abs(got[k] - ref[k]).max() / scale
        assert mid < 2e-2, (k, mid)


def test_backward_decay_monotone():
    enc = _make_encoder(num_layers=1)
    x, f0 = _inputs(b=1, t=12000)
    vs = _init(enc, x, f0)
    rng = np.random.default_rng(3)
    # layer-0 input width: (257 freq bins // 16 pool) * 16 ch + 1 f0
    h = jnp.asarray(rng.standard_normal((1, 48, 257)).astype(np.float32))
    d = backward_decay(enc, vs, h, lookaheads=(4, 16, 32))
    vals = [d[k] for k in sorted(d)]
    assert vals[0] >= vals[-1], d
