"""Golden rounding-policy tests (reference model: tests/test_rounding.py —
all 7 policies vs python decimal semantics; SURVEY §7 hard part: TPUs
default to round-nearest-even, the other modes must be emulated exactly)."""

import decimal

import jax.numpy as jnp
import numpy as np
import pytest

from ppq_tpu.core import RoundingPolicy
from ppq_tpu.quantization.rounding import (round_scalar, round_tensor,
                                           round_tensor_np)

DEC = {
    RoundingPolicy.ROUND_HALF_EVEN: decimal.ROUND_HALF_EVEN,
    RoundingPolicy.ROUND_HALF_UP: None,          # floor(x+0.5) semantics
    RoundingPolicy.ROUND_HALF_DOWN: None,        # ceil(x-0.5) semantics
    RoundingPolicy.ROUND_HALF_TOWARDS_ZERO: None,
    RoundingPolicy.ROUND_HALF_FAR_FROM_ZERO: None,
    RoundingPolicy.ROUND_UP: decimal.ROUND_CEILING,
    RoundingPolicy.ROUND_DOWN: decimal.ROUND_FLOOR,
}

# exact half-value golden table (the only disputed points)
HALues = [-2.5, -1.5, -0.5, 0.5, 1.5, 2.5]
GOLDEN = {
    RoundingPolicy.ROUND_HALF_EVEN:          [-2, -2, -0, 0, 2, 2],
    RoundingPolicy.ROUND_HALF_UP:            [-2, -1, 0, 1, 2, 3],
    RoundingPolicy.ROUND_HALF_DOWN:          [-3, -2, -1, 0, 1, 2],
    RoundingPolicy.ROUND_HALF_TOWARDS_ZERO:  [-2, -1, 0, 0, 1, 2],
    RoundingPolicy.ROUND_HALF_FAR_FROM_ZERO: [-3, -2, -1, 1, 2, 3],
    RoundingPolicy.ROUND_UP:                 [-2, -1, 0, 1, 2, 3],
    RoundingPolicy.ROUND_DOWN:               [-3, -2, -1, 0, 1, 2],
}


@pytest.mark.parametrize('policy', list(GOLDEN))
def test_half_value_golden(policy):
    x = np.asarray(HALues, np.float32)
    want = np.asarray(GOLDEN[policy], np.float32)
    np.testing.assert_array_equal(
        np.asarray(round_tensor(jnp.asarray(x), policy)), want)
    np.testing.assert_array_equal(round_tensor_np(x, policy), want)


@pytest.mark.parametrize('policy', list(GOLDEN))
def test_jnp_numpy_scalar_agree(policy):
    rng = np.random.RandomState(0)
    # avoid float-representation ambiguity right at .5 boundaries except the
    # golden table above; here test general values
    x = np.round(rng.randn(512) * 10, 3).astype(np.float32)
    a = np.asarray(round_tensor(jnp.asarray(x), policy))
    b = round_tensor_np(x, policy)
    np.testing.assert_array_equal(a, b)
    for v in x[:32]:
        assert round_scalar(float(v), policy) == int(b[list(x).index(v)])


def test_non_half_values_all_policies_agree():
    """Away from .5 boundaries every half-* policy must equal plain round."""
    rng = np.random.RandomState(1)
    x = (rng.randn(256) * 5).astype(np.float32)
    x = x[np.abs(x - np.floor(x) - 0.5) > 1e-3]
    base = np.round(x)
    for policy in (RoundingPolicy.ROUND_HALF_EVEN,
                   RoundingPolicy.ROUND_HALF_UP,
                   RoundingPolicy.ROUND_HALF_DOWN,
                   RoundingPolicy.ROUND_HALF_TOWARDS_ZERO,
                   RoundingPolicy.ROUND_HALF_FAR_FROM_ZERO):
        np.testing.assert_array_equal(round_tensor_np(x, policy), base,
                                      err_msg=policy.name)
