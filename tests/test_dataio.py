"""Native prefetching npy loader (csrc/dataloader.cc) vs np.load: bit
parity across dtypes, submit-order delivery, error semantics, fallback."""

import numpy as np
import pytest

from ppq_tpu.utils.dataio import NpyLoader, load_calibration_dir
from ppq_tpu.utils.native import native_dataio

HAVE_NATIVE = native_dataio() is not None


def _write_batches(tmp_path, arrays):
    paths = []
    for i, a in enumerate(arrays):
        p = tmp_path / f'batch_{i:03d}.npy'
        np.save(str(p), a)
        paths.append(str(p))
    return paths


ARRAYS = [
    np.random.RandomState(0).randn(4, 3, 16, 16).astype(np.float32),
    np.random.RandomState(1).randn(2, 7).astype(np.float64),
    np.arange(24, dtype=np.int64).reshape(2, 3, 4),
    np.arange(10, dtype=np.int32),
    (np.random.RandomState(2).rand(5, 5) * 255).astype(np.uint8),
    np.asarray(3.5, np.float32),                     # 0-d
    np.random.RandomState(3).randn(8).astype(np.float16),
]


@pytest.mark.skipif(not HAVE_NATIVE, reason='no native toolchain')
def test_native_parity_all_dtypes(tmp_path):
    paths = _write_batches(tmp_path, ARRAYS)
    got = list(NpyLoader(paths, prefetch=3, threads=2, native=True))
    assert len(got) == len(ARRAYS)
    for g, ref in zip(got, ARRAYS):
        assert g.dtype == ref.dtype and g.shape == ref.shape
        np.testing.assert_array_equal(g, ref)


def test_fallback_parity(tmp_path):
    paths = _write_batches(tmp_path, ARRAYS[:3])
    got = list(NpyLoader(paths, native=False))
    for g, ref in zip(got, ARRAYS[:3]):
        np.testing.assert_array_equal(g, ref)


@pytest.mark.skipif(not HAVE_NATIVE, reason='no native toolchain')
def test_submit_order_many_files(tmp_path):
    arrays = [np.full((3, 3), i, np.int32) for i in range(40)]
    paths = _write_batches(tmp_path, arrays)
    got = list(NpyLoader(paths, prefetch=4, threads=4, native=True))
    for i, g in enumerate(got):
        assert int(g[0, 0]) == i, 'delivery out of submit order'


@pytest.mark.skipif(not HAVE_NATIVE, reason='no native toolchain')
def test_bad_file_raises(tmp_path):
    p = tmp_path / 'junk.npy'
    p.write_bytes(b'not an npy file at all')
    with pytest.raises(IOError):
        list(NpyLoader([str(p)], native=True))


@pytest.mark.skipif(not HAVE_NATIVE, reason='no native toolchain')
def test_load_calibration_dir_feeds_quantizer(tmp_path):
    """End to end: prefetched batches drive a real calibration."""
    from ppq_tpu import TargetPlatform, quantize_graph
    from ppq_tpu.zoo import tiny_cnn
    rng = np.random.RandomState(4)
    _write_batches(tmp_path,
                   [rng.randn(1, 3, 32, 32).astype(np.float32)
                    for _ in range(4)])
    loader = list(load_calibration_dir(str(tmp_path)))
    g = tiny_cnn(input_shape=(1, 3, 32, 32))
    quantize_graph(g, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    from ppq_tpu.ir import QuantableOperation
    assert any(isinstance(op, QuantableOperation)
               for op in g.operations.values())


@pytest.mark.skipif(not HAVE_NATIVE, reason='no native toolchain')
def test_loader_is_reiterable(tmp_path):
    """quantize_graph peeks one batch then iterates again — both passes
    must see batch 0 first (regression: the native session was single
    use and the second pass broke or mispaired)."""
    arrays = [np.full((2, 2), i, np.float32) for i in range(5)]
    paths = _write_batches(tmp_path, arrays)
    dl = NpyLoader(paths, prefetch=2, threads=2, native=True)
    first = next(iter(dl))
    assert float(first[0, 0]) == 0.0
    again = list(dl)
    assert len(again) == 5
    for i, g in enumerate(again):
        assert float(g[0, 0]) == float(i)


def test_load_calibration_dir_limit_zero(tmp_path):
    _write_batches(tmp_path, [np.zeros((1,), np.float32)] * 3)
    from ppq_tpu.utils.dataio import load_calibration_dir
    assert list(load_calibration_dir(str(tmp_path), limit=0)) == []
    assert len(list(load_calibration_dir(str(tmp_path), limit=2))) == 2
