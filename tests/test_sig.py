import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.core.sig import INF_HOP, Sig, linear_upsample, sig_where


def test_linear_upsample_align_corners():
    x = jnp.array([[0.0, 2.0, 4.0]])
    y = linear_upsample(x, 2)
    np.testing.assert_allclose(y[0], [0, 1, 2, 3, 4])
    # endpoints preserved exactly
    x = jnp.array([[1.0, -3.0]])
    y = linear_upsample(x, 4)
    assert y.shape == (1, 5)
    np.testing.assert_allclose(y[0, 0], 1.0)
    np.testing.assert_allclose(y[0, -1], -3.0)


def test_reduce_hop_length():
    s = Sig(jnp.arange(8, dtype=jnp.float32).reshape(2, 4), hop=4)
    r = s.reduce_hop_length()
    assert r.hop == 1
    assert r.shape == (2, 13)  # (4-1)*4 + 1
    np.testing.assert_allclose(r.data[0, :5], [0, 0.25, 0.5, 0.75, 1.0])


def test_hop_broadcast_arithmetic():
    fine = Sig(jnp.ones((2, 9)), hop=1)
    coarse = Sig(jnp.arange(6, dtype=jnp.float32).reshape(2, 3), hop=4)
    out = fine * coarse
    assert out.hop == 1
    # coarse upsampled to 9 steps, truncated to 9
    assert out.shape == (2, 9)
    np.testing.assert_allclose(out.data[0], np.linspace(0, 2, 9))


def test_trailing_dim_broadcast():
    a = Sig(jnp.ones((2, 4)), hop=1)
    b = Sig(jnp.ones((2, 4, 3)), hop=1)
    out = a + b
    assert out.shape == (2, 4, 3)


def test_1d_is_infinite_hop():
    s = Sig(jnp.ones(5))
    assert s.hop == INF_HOP
    # 1-D sigs never get upsampled and keep the partner's hop
    t = Sig(jnp.ones((2, 4)), hop=2)
    out = t * 3.0
    assert out.hop == 2


def test_unfold():
    s = Sig(jnp.arange(10, dtype=jnp.float32)[None], hop=1)
    u = s.unfold(4, 2)
    assert u.hop == 2
    assert u.shape == (1, 4, 4)
    np.testing.assert_allclose(u.data[0, 1], [2, 3, 4, 5])


def test_truncate_and_steps():
    s = Sig(jnp.ones((2, 10)), hop=1)
    assert s.steps == 10
    assert s.truncate(4).shape == (2, 4)


def test_where():
    c = Sig(jnp.array([[1.0, 0.0, 1.0]]), hop=1)
    out = sig_where(c > 0.5, Sig(jnp.full((1, 3), 2.0)), 7.0)
    np.testing.assert_allclose(out.data, [[2.0, 7.0, 2.0]])


def test_pytree_roundtrip():
    import jax
    s = Sig(jnp.ones((2, 4)), hop=3)
    leaves, tree = jax.tree_util.tree_flatten(s)
    s2 = jax.tree_util.tree_unflatten(tree, leaves)
    assert s2.hop == 3

    @jax.jit
    def f(sig: Sig) -> Sig:
        return sig * 2.0

    out = f(s)
    assert out.hop == 3
    np.testing.assert_allclose(out.data, 2.0)
