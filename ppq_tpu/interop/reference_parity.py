"""Head-to-head parity driver: ppq_tpu vs the reference PPQ implementation.

The reference proves "simulator == deployment" by re-running its exported
QDQ graph under onnxruntime (/root/reference/tests/test_onnxruntime.py).
No onnxruntime exists in this image — instead we run the reference
FRAMEWORK ITSELF (CPU torch) on the same ONNX file with the same
calibration tensors and compare:

  * per-tensor activation scales + per-channel weight scales (keyed by
    variable name — both parsers preserve ONNX names);
  * the INT8-simulated model outputs (SNR between the two simulators);
  * fp32 outputs (parser/executor parity, quantization aside).

MUST run in a fresh subprocess: the reference's generated
ppl_caffe_pb2.py needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
before `google.protobuf` first loads, and the torch/jax mix is cleanest
isolated. tests/test_reference_parity.py is the subprocess wrapper.

Usage:  python -m ppq_tpu.interop.reference_parity <out.json> \
            [--model tiny_cnn|resnet18] [--observer minmax|kl|mse]
"""

import os
import sys

# (1) BEFORE protobuf loads anywhere: the reference's pb2 needs the pure-
# python implementation; (2) BEFORE jax initializes: CPU platform.
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')
os.environ['JAX_PLATFORMS'] = 'cpu'

import argparse        # noqa: E402
import json            # noqa: E402

import numpy as np     # noqa: E402


def build_model(name: str, batch: int):
    """Parity models are built here with torch-style conventions (Gemm
    transB=1, weight [out,in]) — the reference quantizer hardcodes Gemm
    channel_axis=0 for that layout (PPLQuantizer.py:46-52)."""
    from ppq_tpu.zoo.builder import NetBuilder
    b = NetBuilder(name, seed=23)
    if name == 'convnet':
        x = b.input('x', [batch, 3, 16, 16])
        h = b.conv(x, 3, 8, k=3, pad=1, bias=True)
        h = b.op('Relu', [h])
        h = b.op('MaxPool', [h], kernel_shape=[2, 2], strides=[2, 2],
                 pads=[0, 0, 0, 0])
        h = b.conv(h, 8, 12, k=3, pad=1, bias=True)
        h = b.op('Relu', [h])
        h = b.op('GlobalAveragePool', [h])
        h = b.op('Flatten', [h], axis=1)
        y = b.op('Gemm', [h, b.param(b.rng.randn(10, 12) * 0.3),
                          b.param(b.rng.randn(10) * 0.01)],
                 alpha=1.0, beta=1.0, transA=0, transB=1)
        b.output(y)
        return b.g, (batch, 3, 16, 16)
    if name == 'resblock':
        x = b.input('x', [batch, 4, 16, 16])
        h = b.conv(x, 4, 8, k=3, pad=1, bias=True)
        h = b.op('Relu', [h])
        r = b.conv(h, 8, 8, k=3, pad=1, bias=True)
        r = b.op('Relu', [r])
        r = b.conv(r, 8, 8, k=3, pad=1, bias=True)
        s = b.op('Add', [r, h])
        s = b.op('Relu', [s])
        s = b.op('GlobalAveragePool', [s])
        s = b.op('Flatten', [s], axis=1)
        y = b.op('Gemm', [s, b.param(b.rng.randn(10, 8) * 0.3),
                          b.param(b.rng.randn(10) * 0.01)],
                 alpha=1.0, beta=1.0, transA=0, transB=1)
        b.output(y)
        return b.g, (batch, 4, 16, 16)
    raise ValueError(name)


def collect_scales(graph, quantable_cls, states_mod):
    """{variable_name: scale_list} for every calibrated ROOT config, split
    into per-tensor activations and per-channel weights."""
    act, wt = {}, {}
    for op in graph.operations.values():
        if not isinstance(op, quantable_cls):
            continue
        pairs = list(zip(op.inputs, op.config.input_quantization_config)) + \
            list(zip(op.outputs, op.config.output_quantization_config))
        for var, cfg in pairs:
            root = cfg.dominated_by if hasattr(cfg, 'dominated_by') else cfg
            if root is not cfg:
                continue                      # only roots own scales
            state = cfg.state
            name = state.name if hasattr(state, 'name') else str(state)
            if name not in ('ACTIVATED', 'BAKED', 'PASSIVE', 'PASSIVE_BAKED'):
                continue
            try:
                scale = np.asarray(cfg.scale, np.float64).reshape(-1)
            except Exception:
                continue
            if getattr(var, 'is_parameter', False):
                if name in ('ACTIVATED', 'BAKED'):   # weights (not bias)
                    wt[var.name] = scale.tolist()
            else:
                act[var.name] = scale.tolist()
    return act, wt


def run_ppq_tpu(onnx_path, model_name, batch, loader, observer):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
    from ppq_tpu.api.setting import QuantizationSettingFactory
    from ppq_tpu.frontends.onnx.exporter import OnnxExporter
    from ppq_tpu.ir import QuantableOperation

    graph, shape = build_model(model_name, batch)
    # export the FP32 graph — the common input both frameworks quantize
    OnnxExporter().export(onnx_path, graph.copy(copy_value=True))

    fp_out = np.asarray(
        TPUExecutor(graph.copy(copy_value=True)).forward(loader[0])[0])

    setting = QuantizationSettingFactory.default_setting()
    setting.calibration.calib_algorithm = observer
    setting.quantize_activation_setting.calib_algorithm = observer
    quantize_graph(graph, loader, calib_steps=len(loader),
                   platform=TargetPlatform.TPU_INT8, setting=setting,
                   verbose=False)
    q_out = np.asarray(TPUExecutor(graph).forward(loader[0])[0])
    act, wt = collect_scales(graph, QuantableOperation, None)
    return {'fp_out': fp_out, 'q_out': q_out, 'act': act, 'wt': wt}


def run_reference(onnx_path, batch, loader, observer):
    from ppq_tpu.interop import install_onnx_shim
    install_onnx_shim()
    ref_root = os.environ.get('PPQ_REFERENCE_ROOT', '/root/reference')
    sys.path.insert(0, ref_root)
    import torch
    from ppq import QuantizationSettingFactory, TargetPlatform
    from ppq.api import quantize_onnx_model
    from ppq.executor import TorchExecutor
    from ppq.IR import QuantableOperation

    t_loader = [torch.from_numpy(x) for x in loader]
    setting = QuantizationSettingFactory.pplcuda_setting()
    setting.quantize_activation_setting.calib_algorithm = observer
    setting.quantize_parameter_setting.calib_algorithm = 'minmax'
    graph = quantize_onnx_model(
        onnx_import_file=onnx_path, calib_dataloader=t_loader,
        calib_steps=len(t_loader), input_shape=list(loader[0].shape),
        platform=TargetPlatform.PPL_CUDA_INT8, setting=setting,
        device='cpu', verbose=0)
    executor = TorchExecutor(graph, device='cpu')
    with torch.no_grad():
        q_out = executor.forward(torch.from_numpy(loader[0]))[0].numpy()
    act, wt = collect_scales(graph, QuantableOperation, None)
    return {'q_out': q_out, 'act': act, 'wt': wt}


def _compare_scales(a: dict, b: dict):
    common = sorted(set(a) & set(b))
    rel = []
    for k in common:
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        if va.shape != vb.shape:
            continue
        rel.append(float(np.max(np.abs(va - vb) / (np.abs(vb) + 1e-12))))
    return {
        'n_ours': len(a), 'n_ref': len(b), 'n_matched': len(common),
        'max_rel_diff': max(rel) if rel else None,
        'mean_rel_diff': float(np.mean(rel)) if rel else None,
    }


def _snr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sum((a - b) ** 2) / (np.sum(b ** 2) + 1e-12))


def _ensure_python_protobuf():
    """The reference's old-gen ppl_caffe_pb2.py only loads under the pure-
    python protobuf implementation, and the env var must be set before
    google.protobuf first loads — which `import ppq_tpu` already did when
    we got here (package __init__ runs before this module). Re-exec with
    the env set when needed."""
    from google.protobuf.internal import api_implementation
    if api_implementation.Type() != 'python':
        env = dict(os.environ,
                   PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION='python')
        os.execve(sys.executable,
                  [sys.executable, '-m', 'ppq_tpu.interop.reference_parity']
                  + sys.argv[1:], env)


def main():
    _ensure_python_protobuf()
    ap = argparse.ArgumentParser()
    ap.add_argument('out_json')
    ap.add_argument('--model', default='convnet')
    ap.add_argument('--observer', default='minmax')
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--steps', type=int, default=8)
    args = ap.parse_args()

    rng = np.random.RandomState(7)
    shape = {'convnet': (args.batch, 3, 16, 16),
             'resblock': (args.batch, 4, 16, 16)}[args.model]
    loader = [rng.randn(*shape).astype(np.float32)
              for _ in range(args.steps)]

    onnx_path = os.path.join('/tmp', f'parity_{args.model}.onnx')
    ours = run_ppq_tpu(onnx_path, args.model, args.batch, loader,
                       args.observer)
    ref = run_reference(onnx_path, args.batch, loader, args.observer)

    result = {
        'model': args.model, 'observer': args.observer,
        'activation_scales': _compare_scales(ours['act'], ref['act']),
        'weight_scales': _compare_scales(ours['wt'], ref['wt']),
        # SNR of the two frameworks' INT8-simulated outputs against each
        # other, and each against fp32 (the Δ both must agree on)
        'sim_cross_snr': _snr(ours['q_out'], ref['q_out']),
        'ours_vs_fp32_snr': _snr(ours['q_out'], ours['fp_out']),
        'ref_vs_fp32_snr': _snr(ref['q_out'], ours['fp_out']),
    }
    with open(args.out_json, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
