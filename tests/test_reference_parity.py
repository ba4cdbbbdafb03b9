"""Head-to-head parity against the reference PPQ implementation.

Runs /root/reference's PPQ (CPU torch, via ppq_tpu.interop.onnx_shim) and
ppq_tpu on the SAME exported ONNX file with the SAME calibration tensors,
then asserts scale agreement and simulator-output agreement — the
replacement for the reference's onnxruntime round-trip guarantee
(/root/reference/tests/test_onnxruntime.py), which this image cannot run.

Each leg is a fresh subprocess: the reference's generated ppl_caffe_pb2
requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python before protobuf
first loads, and the jax/torch state is cleanest isolated.
"""

import json
import os
import subprocess
import sys

import pytest

_REF = os.environ.get('PPQ_REFERENCE_ROOT', '/root/reference')

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF, 'ppq')),
    reason='reference PPQ checkout not available')


def _run_leg(model, observer, tmp_path):
    out = tmp_path / f'parity_{model}_{observer}.json'
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION='python',
               JAX_PLATFORMS='cpu')
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, '-m', 'ppq_tpu.interop.reference_parity',
         str(out), '--model', model, '--observer', observer],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, \
        f'parity driver failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}'
    return json.loads(out.read_text())


@pytest.mark.parametrize('model,observer', [
    ('convnet', 'minmax'),
    ('resblock', 'minmax'),
    ('convnet', 'kl'),
    ('convnet', 'mse'),
    ('resblock', 'kl'),
    ('convnet', 'percentile'),
    ('resblock', 'percentile'),
])
def test_reference_parity(model, observer, tmp_path):
    r = _run_leg(model, observer, tmp_path)

    # weights: both frameworks use symmetric per-channel minmax — the
    # scales must agree BITWISE (identical formula on identical bytes)
    w = r['weight_scales']
    assert w['n_matched'] == w['n_ref'] > 0
    assert w['max_rel_diff'] == 0.0

    # activations: every reference scale has a counterpart; values agree
    # up to algorithmic freedom (our KL/MSE searches use a finer clip
    # grid than the reference's, and alignment master choices can differ)
    a = r['activation_scales']
    assert a['n_matched'] == a['n_ref'] > 0
    if observer in ('minmax', 'percentile'):
        # percentile: same 99.99th target, but estimators differ (our
        # exact bisected quantile over pooled batches vs the reference's
        # per-batch torch.quantile average) and alignment master choices
        # amplify that at residual joins (one resblock site measured 46%
        # apart while the simulators agreed to 4e-5)
        assert a['mean_rel_diff'] < 0.15

    # the two INT8 simulators agree with each other at the quantization-
    # noise level, and our Δ-vs-fp32 stays within 3x of the reference's.
    # percentile deliberately clips the 0.01% tail, so both frameworks'
    # absolute quant error rides higher (ref measured 1.4e-3 here) — the
    # CROSS-simulator and relative bounds are the parity claims
    abs_bound = 3e-3 if observer == 'percentile' else 1e-3
    assert r['sim_cross_snr'] < 1e-3
    assert r['ours_vs_fp32_snr'] < abs_bound
    assert r['ours_vs_fp32_snr'] < 3.0 * max(r['ref_vs_fp32_snr'], 1e-6)
