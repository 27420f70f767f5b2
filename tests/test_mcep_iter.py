"""Iterative mel-cepstral analysis: Newton refinement on the mel-LSA
criterion (the objective SPTK's mcep minimizes; reference MCD metric uses
diffsptk MelCepstralAnalysis, ``ltng/ae.py:214-217``)."""

import jax.numpy as jnp
import numpy as np

from golf_tpu.ops.cepstrum import _warped_cos_basis, mcep


def _lsa(amp, mc, phi):
    s = phi @ mc
    r = 2 * (np.log(amp) - s)
    return float(np.mean(np.exp(r) - r - 1))


def test_mcep_exact_on_model_class():
    rng = np.random.default_rng(0)
    n_bins, order, alpha = 257, 24, 0.46
    phi = _warped_cos_basis(n_bins, order, alpha)
    mc_true = rng.standard_normal(order + 1) * 0.8 ** np.arange(order + 1)
    amp = np.exp(phi @ mc_true)
    mc = np.asarray(mcep(jnp.asarray(amp[None]), order, alpha, n_iter=3))[0]
    np.testing.assert_allclose(mc, mc_true, atol=1e-4)


def test_mcep_iterations_reduce_criterion():
    n_bins, order, alpha = 257, 24, 0.46
    phi = _warped_cos_basis(n_bins, order, alpha)
    f = np.linspace(0, np.pi, n_bins)
    amp = (np.abs(np.sin(20 * f)) + 0.05) * np.exp(-f)   # harmonic-ish
    prev = None
    for it in (0, 1, 2, 4):
        mc = np.asarray(
            mcep(jnp.asarray(amp[None]), order, alpha, n_iter=it))[0]
        cur = _lsa(amp, mc, phi)
        if prev is not None:
            assert cur <= prev + 1e-9, (it, cur, prev)
        prev = cur
    # converged solution is meaningfully better than the initial estimate
    mc0 = np.asarray(mcep(jnp.asarray(amp[None]), order, alpha))[0]
    assert cur < 0.85 * _lsa(amp, mc0, phi)


def test_mcep_batched_shapes():
    rng = np.random.default_rng(1)
    amp = np.abs(rng.standard_normal((2, 5, 257))) + 0.1
    mc = mcep(jnp.asarray(amp), 34, alpha=0.46, n_iter=2)
    assert mc.shape == (2, 5, 35)
    assert np.all(np.isfinite(np.asarray(mc)))
