"""Parity of the Pallas one-hot-matmul wavetable lookup vs the XLA
gather formulation (forward, gradients, and the routed module path).

The kernel runs in interpret mode on CPU; shapes cover aligned and
unaligned hops (lane padding) and non-multiple-of-8 block counts
(sublane group padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.models.synth import (_bilinear_table_lookup, _lookup_blocks,
                                   _lookup_blocks_jnp)


@pytest.mark.parametrize("b,blocks,hop,s", [
    (2, 5, 256, 2048),     # aligned lanes, padded sublanes
    (1, 3, 2400, 2048),    # unaligned hop -> lane padding
    (1, 8, 130, 256),      # tiny unaligned hop
    (3, 16, 128, 512),     # fully aligned
])
def test_forward_parity(b, blocks, hop, s):
    r = np.random.default_rng(0)
    ph = jnp.asarray(r.random((b, blocks, hop), np.float32))
    tabs = jnp.asarray(
        r.standard_normal((b, blocks + 1, s)).astype(np.float32))
    ref = _lookup_blocks_jnp(ph, tabs, hop)
    out = _lookup_blocks(ph, tabs, hop)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-6, rtol=0)


def test_grad_parity():
    r = np.random.default_rng(1)
    b, blocks, hop, s = 1, 4, 256, 1024
    ph = jnp.asarray(r.random((b, blocks, hop), np.float32))
    tabs = jnp.asarray(
        r.standard_normal((b, blocks + 1, s)).astype(np.float32))

    def loss(fn, p_, t_):
        return jnp.sum(jnp.sin(fn(p_, t_, hop)))

    ga = jax.grad(lambda p_, t_: loss(_lookup_blocks_jnp, p_, t_),
                  argnums=(0, 1))(ph, tabs)
    gp = jax.grad(lambda p_, t_: loss(_lookup_blocks, p_, t_),
                  argnums=(0, 1))(ph, tabs)
    # phase grads scale with S (d col/d phase); compare relative
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(ga[0]),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(ga[1]),
                               atol=3e-6, rtol=0)


def test_grad_parity_pallas_residual_path(monkeypatch):
    """The residual-saving VJP (Pallas fwd emits d_top/d_bot; dph is
    elementwise, dtab via the two-level histogram kernel) matches the
    jnp formulation's gradients, incl. the wraparound column."""
    import golf_tpu.models.synth as synth_mod
    monkeypatch.setattr(synth_mod, "_use_pallas_lookup",
                        lambda hop_, s_: True)
    r = np.random.default_rng(3)
    b, blocks, hop, s = 2, 5, 384, 1024
    ph = jnp.asarray(r.random((b, blocks, hop), np.float32))
    ph = ph.at[:, :, :8].set(jnp.asarray(1.0 - 1e-4, jnp.float32))
    tabs = jnp.asarray(
        r.standard_normal((b, blocks + 1, s)).astype(np.float32))

    def loss(fn, p_, t_):
        return jnp.sum(jnp.sin(fn(p_, t_, hop)))

    ga = jax.grad(lambda p_, t_: loss(_lookup_blocks_jnp, p_, t_),
                  argnums=(0, 1))(ph, tabs)
    gp = jax.grad(lambda p_, t_: loss(_lookup_blocks, p_, t_),
                  argnums=(0, 1))(ph, tabs)
    # dph associates the corner terms differently (saved differences);
    # values are O(1e3) so allow a slightly wider relative band
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(ga[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(ga[1]),
                               atol=3e-6, rtol=0)


def test_module_path_routes_and_matches(monkeypatch):
    """_bilinear_table_lookup output is identical with the kernel forced
    on (interpret) and forced off, including the T % hop != 0 tail."""
    r = np.random.default_rng(2)
    b, t, hop, s, frames = 2, 1000, 256, 512, 5
    ph = jnp.asarray(r.random((b, t), np.float32))
    tabs = jnp.asarray(
        r.standard_normal((b, frames, s)).astype(np.float32))

    monkeypatch.setenv("GOLF_TPU_NO_PALLAS_LOOKUP", "1")
    ref = _bilinear_table_lookup(ph, tabs, hop)
    monkeypatch.delenv("GOLF_TPU_NO_PALLAS_LOOKUP")
    import golf_tpu.models.synth as synth_mod
    monkeypatch.setattr(synth_mod, "_use_pallas_lookup",
                        lambda hop_, s_: True)
    out = _bilinear_table_lookup(ph, tabs, hop)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-6, rtol=0)


def test_bwd_kernel_matches_jnp_vjp():
    """Pallas adjoint (bilinear_lookup_pallas_bwd) == the jnp gather
    formulation's VJP, incl. the wraparound column and the multi-lane-
    tile accumulation path (s=8192 -> r=256 -> 2 tiles per block)."""
    import jax

    from golf_tpu.models.synth import _lookup_blocks_jnp
    from golf_tpu.ops.lookup_pallas import bilinear_lookup_pallas_bwd

    rng = np.random.default_rng(0)
    for (b, blocks, hop, s) in [(2, 7, 384, 256), (1, 3, 512, 8192)]:
        ph = jnp.asarray(rng.random((b, blocks, hop), np.float32))
        ph = ph.at[:, :, :8].set(jnp.asarray(1.0 - 1e-4, jnp.float32))
        tabs = jnp.asarray(
            rng.standard_normal((b, blocks + 1, s)).astype(np.float32))
        g = jnp.asarray(
            rng.standard_normal((b, blocks, hop)).astype(np.float32))
        _, vjp = jax.vjp(
            lambda p_, t_: _lookup_blocks_jnp(p_, t_, hop), ph, tabs)
        dph_ref, dt_ref = vjp(g)
        dph, dt = bilinear_lookup_pallas_bwd(ph, tabs, g, hop, True)
        for got, ref in ((dph, dph_ref), (dt, dt_ref)):
            err = (np.abs(np.asarray(got - ref)).max()
                   / (np.abs(np.asarray(ref)).max() + 1e-9))
            assert err < 1e-5, (b, blocks, hop, s, err)
