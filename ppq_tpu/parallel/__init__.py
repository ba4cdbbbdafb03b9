from .mesh import (batch_sharding, make_mesh, replicate, shard_qparams,
                   tp_param_shardings)
from .train import make_sharded_train_step

__all__ = [
    'make_mesh', 'tp_param_shardings', 'batch_sharding', 'replicate',
    'shard_qparams', 'make_sharded_train_step',
]
