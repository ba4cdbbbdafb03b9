"""Scatter deep-dive: is the 21ms a failed in-place alias, or update overhead?

  noop     — donated identity (aliasing baseline; ~0 if alias works)
  touch1   — donated single-row dynamic_update_slice (known aliasable)
  tok_srt  — per-token scatter, rows sorted + indices_are_sorted
  win      — time-minor pool (L*NB, 2, KVDh, BLK): ONE window (KVDh, T)
             update per (L, B, plane) = 4096 indices
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

L, NB, BLK, KVDh = 16, 513, 256, 1024
B, T = 128, 32
rng = np.random.RandomState(0)
rows_np = np.sort(rng.permutation(NB - 1)[:B] + 1)
off0_np = rng.randint(0, BLK - T, size=B)
rows = jnp.asarray(rows_np, jnp.int32)
off0 = jnp.asarray(off0_np, jnp.int32)


def bench(name, f, *args):
    state = f(*args)
    np.asarray(jax.tree.leaves(state)[0].ravel()[:4])
    outs = [state]
    t0 = time.perf_counter()
    for _ in range(10):
        outs.append(f(outs[-1]if len(args) == 1 else outs[-1], *args[1:]))
        outs.pop(0)
    np.asarray(jax.tree.leaves(outs[-1])[0].ravel()[:4])
    dt = (time.perf_counter() - t0) / 10
    print(f'{name}: {dt*1e3:.2f} ms/call', flush=True)
    return outs[-1]


# --- noop + touch1 ---------------------------------------------------------
pool = jnp.zeros((L * NB, 2, BLK, KVDh), jnp.int8)
f_noop = jax.jit(lambda p: p.at[0, 0, 0, 0].set(1), donate_argnums=0)
pool = bench('touch1', f_noop, pool)

# --- tok sorted ------------------------------------------------------------
upd = jnp.asarray(rng.randint(-127, 127, (L, B, T, 2, KVDh)), jnp.int8)


def tok(pool, upd):
    pos = off0[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    lrows = (jnp.arange(L, dtype=jnp.int32)[:, None, None] * NB
             + rows[None, :, None])
    lrows = jnp.broadcast_to(lrows, (L, B, T))
    plane = jnp.arange(2, dtype=jnp.int32)[None, None, None]
    return pool.at[lrows[..., None], plane, pos[None, :, :, None]].set(
        upd, unique_indices=True, indices_are_sorted=True,
        mode='promise_in_bounds')


pool = bench('tok_srt', jax.jit(tok, donate_argnums=0), pool, upd)
del pool

# --- window scatter on time-minor pool ------------------------------------
pool2 = jnp.zeros((L * NB, 2, KVDh, BLK), jnp.int8)
updw = jnp.asarray(rng.randint(-127, 127, (L, B, 2, KVDh, T)), jnp.int8)


def win2(pool2, updw):
    # true windowed scatter: KVDh and T covered as slice dims via
    # lax.scatter with update_window_dims
    lrows = (jnp.arange(L, dtype=jnp.int32)[:, None] * NB
             + rows[None, :])                                  # (L,B)
    idx = jnp.stack([
        jnp.broadcast_to(lrows[..., None], (L, B, 2)),
        jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None, None],
                         (L, B, 2)),
        jnp.zeros((L, B, 2), jnp.int32),
        jnp.broadcast_to(off0[None, :, None], (L, B, 2)),
    ], axis=-1).reshape(L * B * 2, 4)
    updf = updw.reshape(L * B * 2, KVDh, T)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1, 2, 3))
    return jax.lax.scatter(
        pool2, idx, updf, dn, indices_are_sorted=False,
        unique_indices=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


pool2 = bench('win_true', jax.jit(win2, donate_argnums=0), pool2, updw)
