"""MoE-enabled serving engine: generation works, TP/EP-sharded matches."""

import jax
import numpy as np
import pytest

from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params
from ppq_tpu.serving.engine import Request


def moe_cfg():
    cfg = LlamaConfig.tiny()
    cfg.n_experts = 4
    cfg.top_k = 2
    return cfg


def test_moe_engine_generates():
    cfg = moe_cfg()
    params = init_llama_params(cfg, seed=11)
    assert 'moe' in params['layers'][0]
    eng = ServingEngine(cfg, params)
    reqs = [Request(0, [3, 1, 4], max_new_tokens=5)]
    eng.run(reqs)
    assert len(reqs[0].generated) == 5


def test_moe_engine_sharded_matches():
    n = min(2, len(jax.devices()))
    if n < 2:
        pytest.skip('needs multiple devices')
    from jax.sharding import Mesh
    cfg = moe_cfg()
    params = init_llama_params(cfg, seed=12)
    r1 = Request(0, [5, 2], max_new_tokens=4)
    ServingEngine(cfg, params).run([r1])

    mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n), ('dp', 'tp'))
    r2 = Request(0, [5, 2], max_new_tokens=4)
    ServingEngine(cfg, params, mesh=mesh).run([r2])
    assert r1.generated == r2.generated
