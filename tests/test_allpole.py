import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import lfilter as scipy_lfilter

from golf_tpu.ops.allpole import (allpole, allpole_const, allpole_scan,
                                  lfilter, lpc_synthesis)


def _ref_tv_allpole(x, a):
    """Numpy loop reference: y[n] = x[n] - sum a_i[n] y[n-i]."""
    b, t = x.shape
    p = a.shape[-1]
    y = np.zeros_like(x)
    for n in range(t):
        acc = x[:, n].copy()
        for i in range(1, p + 1):
            if n - i >= 0:
                acc -= a[:, n, i - 1] * y[:, n - i]
        y[:, n] = acc
    return y


def _stable_coeffs(rng, b, t, p, scale=0.3):
    """Random stable, slowly-varying coeffs via reflection coefficients.

    Smooth trajectories keep the *time-varying* system bounded (per-sample
    pole stability alone does not) — matching how the trained encoder
    actually drives the filter."""
    from golf_tpu.ops.dsp import rc2lpc
    hop = 32
    frames = t // hop + 2
    rc_f = np.tanh(rng.standard_normal((b, frames, p)) * scale)
    up = np.stack([
        np.stack([np.interp(np.arange(t) / hop, np.arange(frames),
                            rc_f[bi, :, j]) for j in range(p)], -1)
        for bi in range(b)])
    return np.asarray(rc2lpc(jnp.asarray(up)))


def test_scan_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 50)).astype(np.float32)
    a = _stable_coeffs(rng, 2, 50, 4).astype(np.float32)
    y = allpole_scan(jnp.asarray(x), jnp.asarray(a))
    np.testing.assert_allclose(y, _ref_tv_allpole(x, a), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t,p,block", [(200, 4, 16), (333, 7, 32),
                                       (1024, 22, 64)])
def test_blocked_matches_scan(t, p, block):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, t)).astype(np.float32)
    a = _stable_coeffs(rng, 3, t, p).astype(np.float32)
    y_ref = np.asarray(allpole_scan(jnp.asarray(x), jnp.asarray(a)))
    y = np.asarray(allpole(jnp.asarray(x), jnp.asarray(a),
                           block_size=block))
    # fp32, order up to 22: compare relative to the signal scale (high-Q
    # resonances amplify rounding differently between algorithms)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y - y_ref).max() / scale < 1e-3


def test_grad_matches_autodiff():
    rng = np.random.default_rng(2)
    b, t, p = 2, 96, 3
    x = jnp.asarray(rng.standard_normal((b, t)), jnp.float32)
    a = jnp.asarray(_stable_coeffs(rng, b, t, p), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, t)), jnp.float32)

    def loss_custom(x, a):
        return jnp.sum(allpole(x, a, block_size=16) * w)

    def loss_scan(x, a):
        return jnp.sum(allpole_scan(x, a) * w)

    gx_c, ga_c = jax.grad(loss_custom, argnums=(0, 1))(x, a)
    gx_s, ga_s = jax.grad(loss_scan, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(gx_c, gx_s, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ga_c, ga_s, rtol=1e-3, atol=1e-4)


def test_const_matches_scipy():
    rng = np.random.default_rng(3)
    n, t, p = 4, 128, 6
    from golf_tpu.ops.dsp import rc2lpc
    rc = np.tanh(rng.standard_normal((n, 1, p)) * 0.4)
    a = np.asarray(rc2lpc(jnp.asarray(rc)))[:, 0, :].astype(np.float32)
    x = rng.standard_normal((n, t)).astype(np.float32)
    y = allpole_const(jnp.asarray(x), jnp.asarray(a))
    for i in range(n):
        ref = scipy_lfilter([1.0], np.concatenate([[1.0], a[i]]), x[i])
        np.testing.assert_allclose(y[i], ref, rtol=1e-4, atol=1e-4)


def test_const_grad():
    rng = np.random.default_rng(4)
    n, t, p = 2, 64, 3
    from golf_tpu.ops.dsp import rc2lpc
    rc = np.tanh(rng.standard_normal((n, 1, p)) * 0.4)
    a = jnp.asarray(np.asarray(rc2lpc(jnp.asarray(rc)))[:, 0, :], jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, t)), jnp.float32)

    def f(x, a):
        return jnp.sum(jnp.sin(allpole_const(x, a)))

    def f_ref(x, a):
        a_tv = jnp.broadcast_to(a[:, None, :], (n, t, p))
        return jnp.sum(jnp.sin(allpole_scan(x, a_tv)))

    gx, ga = jax.grad(f, argnums=(0, 1))(x, a)
    gx_r, ga_r = jax.grad(f_ref, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(gx, gx_r, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ga, ga_r, rtol=1e-3, atol=1e-4)


def test_lfilter_vs_scipy():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 100)).astype(np.float32)
    b = np.array([0.5, 0.3, 0.2], np.float32)
    a = np.array([1.0, -0.5, 0.25], np.float32)
    y = lfilter(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b))
    for i in range(2):
        ref = scipy_lfilter(b, a, x[i])
        np.testing.assert_allclose(y[i], ref, rtol=1e-4, atol=1e-5)


def test_lpc_synthesis_gain():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((3, 40)), jnp.float32)
    a = jnp.zeros((3, 2))
    g = jnp.asarray([1.0, 2.0, 0.5])
    y = lpc_synthesis(x, g, a)
    np.testing.assert_allclose(y, x * g[:, None], rtol=1e-6)


def test_long_sequence_stability():
    # order-22 stable filter over 6000 samples: blocked must not blow up
    rng = np.random.default_rng(7)
    t = 6000
    x = rng.standard_normal((1, t)).astype(np.float32) * 0.1
    a = _stable_coeffs(rng, 1, t, 22).astype(np.float32)
    y = allpole(jnp.asarray(x), jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(y)))
    y_ref = allpole_scan(jnp.asarray(x), jnp.asarray(a))
    err = np.max(np.abs(np.asarray(y - y_ref)))
    scale = np.max(np.abs(np.asarray(y_ref))) + 1e-9
    assert err / scale < 1e-3


def test_dispatch_table_routing(tmp_path, monkeypatch):
    """A recorded dispatch table must route B=1 serving to the blocked
    kernel and the lane-filling training shape to pallas (VERDICT r2
    item #3), via nearest log-shape lookup; without a table the
    heuristic also keeps B=1 off pallas."""
    import json

    from golf_tpu.ops import allpole as ap

    table = {"device": "test", "fetch_floor_ms": 0.1, "entries": [
        {"kernel": "tv", "b": 1, "t": 144000, "p": 22,
         "pallas_ms": 1.0, "blocked_ms": 0.1, "winner": "blocked"},
        {"kernel": "tv", "b": 64, "t": 48000, "p": 22,
         "pallas_ms": 0.5, "blocked_ms": 2.0, "winner": "pallas"},
    ]}
    path = tmp_path / "allpole_dispatch.json"
    path.write_text(json.dumps(table))

    def load():
        return json.loads(path.read_text())["entries"]

    monkeypatch.setattr(ap, "_dispatch_table", load)
    ap._table_winner.cache_clear()
    # nearest-gridpoint routing (backend check bypassed: query the
    # table resolver directly, as _use_pallas returns False on CPU)
    assert ap._table_winner("tv", 1, 144000, 22) == "blocked"
    assert ap._table_winner("tv", 2, 96000, 22) == "blocked"
    assert ap._table_winner("tv", 64, 48000, 22) == "pallas"
    assert ap._table_winner("tv", 128, 48000, 22) == "pallas"
    ap._table_winner.cache_clear()

    # the fallback heuristic (no table) also keeps B=1 serving blocked
    monkeypatch.setattr(ap, "_dispatch_table", lambda: None)
    assert ap._table_winner("tv", 1, 144000, 22) is None
    ap._table_winner.cache_clear()


def test_dispatch_table_real_file():
    """The COMMITTED measured table (golf_tpu/ops/allpole_dispatch.json,
    recorded by tools/allpole_sweep.py on v5e) must exist, parse, and
    route the canonical shapes by measurement: B=1 serving -> blocked,
    the lane-filling B=64 training shape -> pallas (VERDICT r3 #3)."""
    import json
    import pathlib

    from golf_tpu.ops import allpole as ap

    path = (pathlib.Path(ap.__file__).parent / "allpole_dispatch.json")
    assert path.exists(), "dispatch table not committed"
    tab = json.loads(path.read_text())
    assert tab["entries"], tab
    kinds = {e["kernel"] for e in tab["entries"]}
    assert kinds == {"tv", "const"}, kinds
    for e in tab["entries"]:
        assert e["winner"] in ("pallas", "blocked")

    ap._dispatch_table.cache_clear()
    ap._table_winner.cache_clear()
    assert ap._table_winner("tv", 1, 144000, 22) == "blocked"
    assert ap._table_winner("tv", 64, 48000, 22) == "pallas"
    ap._table_winner.cache_clear()


@pytest.mark.slow
def test_allpole_const_blocked_matches_scan():
    """Blocked two-pass const kernel (K-free sensitivity tracking) vs the
    sequential scan, incl. non-divisible T and order > block edge."""
    from golf_tpu.ops.allpole import _allpole_const_blocked

    rng = np.random.default_rng(11)
    for n, t, p, bs in [(4, 960, 22, 32), (2, 715, 22, 32),
                        (3, 100, 4, 8), (1, 65, 22, 8)]:
        x = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
        a = jnp.asarray((rng.standard_normal((n, p)) * 0.1).astype(
            np.float32))

        def step(s, x_t):
            y_t = x_t - jnp.sum(a * s, axis=-1)
            s = jnp.concatenate([y_t[:, None], s[:, :-1]], axis=1)
            return s, y_t

        _, ref = jax.lax.scan(step, jnp.zeros((n, p), jnp.float32),
                              jnp.moveaxis(x, 1, 0))
        ref = jnp.moveaxis(ref, 0, 1)
        got = _allpole_const_blocked(x, a, bs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-4)
