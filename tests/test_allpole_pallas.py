import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.ops.allpole import allpole_scan
from golf_tpu.ops.allpole_pallas import allpole_pallas
from golf_tpu.ops.dsp import rc2lpc


@pytest.mark.parametrize("b,t,p,tb", [(3, 500, 5, 128), (1, 130, 22, 64),
                                      (130, 64, 3, 32)])
def test_pallas_interpret_matches_scan(b, t, p, tb):
    rng = np.random.default_rng(b * 100 + p)
    x = rng.standard_normal((b, t)).astype(np.float32)
    rc = np.tanh(rng.standard_normal((b, t, p)) * 0.2)
    a = np.asarray(rc2lpc(jnp.asarray(rc)))
    y_ref = np.asarray(allpole_scan(jnp.asarray(x), jnp.asarray(a)))
    y = np.asarray(allpole_pallas(jnp.asarray(x), jnp.asarray(a),
                                  time_block=tb, interpret=True))
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y - y_ref).max() / scale < 1e-5


def test_pallas_const_matches_scan():
    from golf_tpu.ops.allpole_pallas import allpole_const_pallas
    rng = np.random.default_rng(5)
    n, t, p = 200, 300, 7
    a = np.asarray(rc2lpc(jnp.tanh(jnp.asarray(
        rng.standard_normal((n, 1, p)).astype(np.float32) * 0.3))))[:, 0]
    x = rng.standard_normal((n, t)).astype(np.float32)
    a_tv = jnp.broadcast_to(jnp.asarray(a)[:, None, :], (n, t, p))
    y_ref = np.asarray(allpole_scan(jnp.asarray(x), a_tv))
    y = np.asarray(allpole_const_pallas(
        jnp.asarray(x), jnp.asarray(a), time_block=64, batch_block=128,
        interpret=True))
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y - y_ref).max() / scale < 1e-5
