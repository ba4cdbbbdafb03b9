"""Native C++ solver parity vs numpy fallbacks (reference test pattern:
tests/test_cuda_kernel.py — two paths, exact equality)."""

import numpy as np
import pytest

from ppq_tpu.core import PPQ_TPU_CONFIG
from ppq_tpu.quantization import solvers
from ppq_tpu.utils.native import native_solvers

RNG = np.random.RandomState(0)


@pytest.fixture(scope='module')
def lib():
    lib = native_solvers()
    if lib is None:
        pytest.skip('native toolchain unavailable')
    return lib


def _numpy_only(fn, *args, **kwargs):
    saved = PPQ_TPU_CONFIG.USING_NATIVE_SOLVER
    PPQ_TPU_CONFIG.USING_NATIVE_SOLVER = False
    try:
        return fn(*args, **kwargs)
    finally:
        PPQ_TPU_CONFIG.USING_NATIVE_SOLVER = saved


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_kl_search_parity(lib, seed):
    """Compare through the PUBLIC entry with the native flag toggled —
    kl_threshold_search applies the reference's near-zero suppression
    (solvers.py) before dispatching to either backend, so comparing the
    raw lib call against the wrapped one would diff the suppression, not
    the solver."""
    rng = np.random.RandomState(seed)
    hist = np.abs(rng.randn(2048)) * np.exp(-np.arange(2048) / 300.0)
    hist = (hist * 1000).astype(np.float64)
    want = _numpy_only(solvers.kl_threshold_search, hist, 128, 8)
    got = solvers.kl_threshold_search(hist, 128, 8)
    assert got == want


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_mse_search_parity(lib, seed):
    rng = np.random.RandomState(seed)
    hist = (np.abs(rng.randn(2048)) *
            np.exp(-np.arange(2048) / 500.0) * 1000).astype(np.float64)
    want = _numpy_only(solvers.mse_threshold_search, hist, 0.01, 128, 8)
    got = lib.mse_search(hist, 0.01, 128, 8)
    assert got == want


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_isotone_parity(lib, seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(257).astype(np.float64)
    want = _numpy_only(solvers.isotone_solve, v)
    got = lib.isotone(v)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    assert np.all(np.diff(got) >= -1e-12)  # non-decreasing


def test_solver_uses_native_when_enabled(lib):
    """With the flag on, solvers.py must dispatch to the native lib."""
    hist = (np.abs(RNG.randn(2048)) * 100).astype(np.float64)
    assert PPQ_TPU_CONFIG.USING_NATIVE_SOLVER
    native = solvers.kl_threshold_search(hist, 128, 8)
    fallback = _numpy_only(solvers.kl_threshold_search, hist, 128, 8)
    assert native == fallback
