"""phase_packed_conv3x3 == direct 3x3/s1/p1 conv, values and gradients.

The lowering claims exact same math (zero phase taps contribute exactly 0 and
depth_to_space is a pure permutation), so fp32 tolerances here are tight.
TPU-side verification is benchmarks/ab_phase_packed_conv.py + the numeric
sweep gate (CLAUDE.md policy for reshape-heavy lowerings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mde_tpu.ops.phase_pack import best_phases, phase_packed_conv3x3


def _direct(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


@pytest.mark.parametrize("phases", [(2, 2), (2, 1), (1, 2)])
@pytest.mark.parametrize("cin,cout,h,w", [(32, 32, 16, 24), (16, 1, 8, 12), (7, 5, 4, 6)])
def test_matches_direct_conv(phases, cin, cout, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    got = jax.jit(lambda a: phase_packed_conv3x3(a, k, phases, b))(x)
    want = _direct(x, k, b)
    # rtol 1e-4: the packed conv contracts in a different order (enlarged
    # kernel with zero taps), so fp32 results differ in the last ulps.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gradients_match_direct_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16, 32), jnp.float32)

    def loss_packed(xx, kk):
        return jnp.sum(phase_packed_conv3x3(xx, kk, (2, 2)) ** 2)

    def loss_direct(xx, kk):
        return jnp.sum(_direct(xx, kk) ** 2)

    gx_p, gk_p = jax.grad(loss_packed, (0, 1))(x, k)
    gx_d, gk_d = jax.grad(loss_direct, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d), rtol=1e-4, atol=1e-4)


def test_rejects_indivisible_input():
    x = jnp.zeros((1, 7, 8, 4))
    k = jnp.zeros((3, 3, 4, 4))
    with pytest.raises(ValueError):
        phase_packed_conv3x3(x, k, (2, 2))


def test_best_phases_cycle_model():
    # Lane-probe cycle model: cycles ~ taps/positions * ceil(total_cout/128).
    assert best_phases(1) == (2, 2)
    assert best_phases(16) == (2, 2)
    assert best_phases(32) == (2, 2)
    assert best_phases(48) == (2, 1)
    assert best_phases(64) == (2, 1)
    assert best_phases(96) is None
    assert best_phases(128) is None
    assert best_phases(256) is None
