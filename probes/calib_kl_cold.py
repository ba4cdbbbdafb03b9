"""Cold-start kl / mse calibration throughput on the real chip.

Round-4 verdict #7: only percentile got the single-phase bisection
treatment; kl/mse still pay the two-phase sweep (+ the host clip
search). Measures the resnet18 512-image protocol (bench.py's
quantize phase) per method, splitting compile vs run wall so the fix
targets the right term. Run on the TPU (no env overrides)."""
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np  # noqa: E402


def run(method: str):
    import jax
    if '--cache' in sys.argv:
        from ppq_tpu.core.config import enable_compilation_cache
        enable_compilation_cache()
    from ppq_tpu import TargetPlatform, quantize_graph
    from ppq_tpu.api.setting import QuantizationSettingFactory
    from ppq_tpu.quantization.optim.fcalibration import \
        LAST_CALIBRATION_PROFILE as calprof
    from ppq_tpu.zoo.vision import resnet18

    graph = resnet18(input_shape=[32, 3, 224, 224])
    rng = np.random.RandomState(0)
    loader = [rng.randn(32, 3, 224, 224).astype(np.float32)
              for _ in range(16)]
    setting = QuantizationSettingFactory.default_setting()
    setting.calibration.calib_algorithm = method
    t0 = time.perf_counter()
    quantize_graph(graph, loader, calib_steps=16,
                   platform=TargetPlatform.TPU_INT8, setting=setting,
                   verbose=False)
    wall = time.perf_counter() - t0
    ips = 512.0 / wall
    print(f'{method}: wall={wall:.1f}s ips={ips:.1f} profile={dict(calprof)}',
          flush=True)


if __name__ == '__main__':
    run(sys.argv[1] if len(sys.argv) > 1 else 'kl')
