"""Global framework configuration (ppq/core/config.py:1-21 equivalent)."""


class _GlobalConfig:
    """Mutable singleton of framework-wide switches."""

    def __init__(self):
        self.VERSION = '0.1.0'
        self.NAME = 'ppq_tpu'
        # use Pallas kernels for quant math where available (reference flag:
        # PPQ_GLOBAL_CONFIGURATION.USING_CUDA_KERNEL)
        self.USING_PALLAS_KERNEL = False
        # use the native C++ solvers (hist-MSE / isotone) when built
        self.USING_NATIVE_SOLVER = True
        # dump tensor values when exporting
        self.DUMP_VALUE_WHEN_EXPORT = False
        self.EXPORT_INTERNAL_INFO = False
        self.DEBUG = False
        # whole-graph XLA compilation (vs per-op interpreter) in the executor
        self.PREFER_COMPILED_EXECUTOR = True


PPQ_TPU_CONFIG = _GlobalConfig()


def enable_compilation_cache(cache_dir: str = '/tmp/ppq_tpu_xla_cache',
                             min_compile_secs: float = 2.0):
    """Turn on JAX's persistent XLA compilation cache — repeat quantization
    and serving runs of the same model then skip their multi-minute
    first-compiles. Call once before any jit."""
    import jax
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_secs))
