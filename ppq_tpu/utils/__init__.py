from .ema import EMARecorder
from .fetch import (batch_random_fetch, channel_random_fetch,
                    tensor_random_fetch)

__all__ = ['EMARecorder', 'batch_random_fetch', 'channel_random_fetch',
           'tensor_random_fetch']
