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
    # the reference's PPLNN dispatcher (dispatchers.py:278) refines the
    # conservative region with backend fusion knowledge; the conservative
    # solver covers its behavior on the socket model here.
    'pplnn':        ConservativeDispatcher,
}


def register_dispatcher(name: str, dispatcher_cls):
    """(reference: user extension point for DISPATCHER_TABLE)"""
    DISPATCHER_TABLE[name.lower()] = dispatcher_cls

__all__ = [
    'GraphDispatcher', 'DISPATCHER_TABLE', 'ConservativeDispatcher',
    'AggressiveDispatcher', 'AllinDispatcher', 'PointDispatcher',
    'PerseusDispatcher', 'soi_generators', 'soi_receivers',
]
