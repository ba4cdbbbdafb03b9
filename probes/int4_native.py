"""Can Mosaic load native-int4 VMEM refs and convert to bf16?"""
import functools
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

B, D, F, TF = 64, 2048, 11264, 1024

def kern(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)

@jax.jit
def qmm4n(x, w4, scale):
    return pl.pallas_call(
        kern,
        grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.bfloat16),
    )(x, w4, scale)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
q = rng.integers(-8, 8, (D, F)).astype(np.int8)
w4 = jnp.asarray(q).astype(jnp.int4)
print('int4 array bytes on device:', w4.nbytes if hasattr(w4,'nbytes') else '?',
      w4.dtype)
scale = jnp.asarray(rng.random((1, F)) * 0.01, jnp.float32)
got = np.asarray(qmm4n(x, w4, scale), np.float32)
ref = np.asarray(x, np.float32) @ (q.astype(np.float32) * np.asarray(scale))
print('max rel:', np.abs(got - ref).max() / np.abs(ref).max())
