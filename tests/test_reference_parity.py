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


def _run_leg(model, observer, tmp_path, *extra, timeout=600, tag=''):
    out = tmp_path / f'parity_{model}_{observer}{tag}.json'
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION='python',
               JAX_PLATFORMS='cpu')
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, '-m', 'ppq_tpu.interop.reference_parity',
         str(out), '--model', model, '--observer', observer, *extra],
        cwd=repo, env=env, capture_output=True, text=True, timeout=timeout)
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

    if observer == 'minmax' and model == 'convnet':
        # linear chains have no alignment-master freedom: the root-scale
        # multiset over matched names must agree tightly (same estimator
        # on same data) — the r4 bound of 0.15 was hiding master-choice
        # differences that only exist at residual joins
        ms = r['activation_root_multiset']
        assert ms['max_rel_diff'] is not None and ms['max_rel_diff'] < 0.01


@pytest.mark.parametrize('model', ['convnet', 'resblock'])
def test_qdq_exporter_artifact_loop(model, tmp_path):
    """The reference parses OUR exported QDQ onnx and executes it (its
    parser + TorchExecutor; we supply only the two textbook QDQ kernels
    through its register_operation_handler API) — the exported ARTIFACT
    must carry the quantized semantics bit-for-bit, the deployment
    guarantee the reference anchored with onnxruntime
    (/root/reference/tests/test_onnxruntime.py:1-101)."""
    r = _run_leg(model, 'minmax', tmp_path, '--qdq-loop', '--per-op',
                 tag='_qdq')
    assert r['qdq_artifact_snr'] < 1e-9, r['qdq_artifact_snr']
    # per-op graphwise cross-simulator SNR: every intermediate agrees at
    # the quantization-noise level, not just the final output
    p = r['per_op']
    assert p['n_matched'] >= 5
    assert p['max_snr'] < 5e-3, p


def test_equalization_parity(tmp_path):
    """LayerwiseEqualizationPass: identical iterative rescale on both
    frameworks — the rescaled WEIGHTS must agree (within accumulated
    fp rounding across 10 iterations)."""
    r = _run_leg('convnet', 'minmax', tmp_path, '--passes', 'equalization',
                 tag='_eq')
    p = r['params']
    assert p['n_matched'] >= 4
    assert p['max_rel_diff'] < 0.05, p
    assert r['sim_cross_snr'] < 1e-3


@pytest.mark.slow
def test_bias_correction_parity(tmp_path):
    """Both frameworks' bias correction IMPROVES their own quantization
    error on the same model/data, and the corrected errors agree within
    3x (the r5 harness caught our earlier whole-net variant WORSENING
    the error while the reference improved — double-counted upstream
    error; fixed to the reference's block-local form)."""
    base = _run_leg('convnet', 'minmax', tmp_path, tag='_b0')
    r = _run_leg('convnet', 'minmax', tmp_path, '--passes', 'bias',
                 tag='_b1')
    assert r['ours_vs_fp32_snr'] < base['ours_vs_fp32_snr']
    assert r['ref_vs_fp32_snr'] < base['ref_vs_fp32_snr']
    assert r['ours_vs_fp32_snr'] < 3.0 * max(r['ref_vs_fp32_snr'], 1e-7)


@pytest.mark.slow
def test_lsq_parity(tmp_path):
    """LSQ on the same block with identical data: both frameworks
    improve, final Δs within 3x."""
    base = _run_leg('convnet', 'minmax', tmp_path, tag='_l0')
    r = _run_leg('convnet', 'minmax', tmp_path, '--passes', 'lsq',
                 timeout=1200, tag='_l1')
    assert r['ours_vs_fp32_snr'] < base['ours_vs_fp32_snr']
    assert r['ref_vs_fp32_snr'] < base['ref_vs_fp32_snr']
    assert r['ours_vs_fp32_snr'] < 3.0 * max(r['ref_vs_fp32_snr'], 1e-7)


@pytest.mark.slow
def test_resnet18_full_topology_parity(tmp_path):
    """The real zoo resnet18 at 224x224 through the harness (the r4
    models were 2-3-conv toys): weight scales bitwise, cross-simulator
    and per-op SNR at quantization-noise level, QDQ artifact loop
    bit-exact."""
    r = _run_leg('resnet18', 'minmax', tmp_path, '--batch', '2',
                 '--steps', '8', '--qdq-loop', '--per-op', timeout=2400,
                 tag='_rn')
    w = r['weight_scales']
    assert w['n_matched'] == w['n_ref'] > 15
    # not exactly 0.0 like the fusion-free toys: both frameworks fold BN
    # before quantizing and the fold's fp32 arithmetic rounds differently
    # (measured 1.4e-7) — same estimator on numerically-equal weights
    assert w['max_rel_diff'] < 1e-6
    assert r['sim_cross_snr'] < 1e-3
    # not bit-exact at this depth (unlike the toy legs): a value landing
    # on a requantization tie flips its int8 code on a ~1e-7 framework
    # reassociation difference, and 224x224 activations hit ties — the
    # artifact bound is 'well under the quantization noise itself'
    assert r['qdq_artifact_snr'] < 0.5 * r['ours_vs_fp32_snr']
    assert r['per_op']['max_snr'] < 2e-2
