from .base import GraphDispatcher, soi_generators, soi_receivers
from .dispatchers import (AggressiveDispatcher, AllinDispatcher,
                          ConservativeDispatcher, PerseusDispatcher,
                          PointDispatcher)

# reference: ppq/scheduler/__init__.py:8-15 DISPATCHER_TABLE
DISPATCHER_TABLE = {
    'conservative': ConservativeDispatcher,
    'aggressive':   AggressiveDispatcher,
    'aggresive':    AggressiveDispatcher,   # reference spelling kept as alias
    'pointwise':    PointDispatcher,
    'allin':        AllinDispatcher,
    'perseus':      PerseusDispatcher,
}

__all__ = [
    'GraphDispatcher', 'DISPATCHER_TABLE', 'ConservativeDispatcher',
    'AggressiveDispatcher', 'AllinDispatcher', 'PointDispatcher',
    'PerseusDispatcher', 'soi_generators', 'soi_receivers',
]
