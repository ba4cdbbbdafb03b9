"""ImageNet-style evaluation harness
(reference: ppq/samples/Imagenet/evaluation_with_imagenet.py).

Point DATA_DIR at a directory of (input.npy, label.npy) batch pairs — the
zero-egress environment ships no dataset, so by default this evaluates on a
synthetic labeled set to demonstrate the protocol end-to-end.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.zoo import resnet18
from ppq_tpu.zoo.evaluate import evaluate_classification

DATA_DIR = 'imagenet_batches'   # optional: dir of {name}_x.npy/{name}_y.npy
BATCHES = 16
SHAPE = (8, 3, 224, 224)


def load_batches():
    if _os.path.isdir(DATA_DIR):
        xs = sorted(f for f in _os.listdir(DATA_DIR) if f.endswith('_x.npy'))
        xs = xs[:BATCHES]
        # interleave x/y through the prefetching native npy loader
        from ppq_tpu.utils.dataio import NpyLoader
        paths = []
        for f in xs:
            paths.append(_os.path.join(DATA_DIR, f))
            paths.append(_os.path.join(DATA_DIR, f.replace('_x', '_y')))
        arrs = list(NpyLoader(paths, prefetch=8))
        return list(zip(arrs[0::2], arrs[1::2]))
    rng = np.random.RandomState(0)
    return [(rng.randn(*SHAPE).astype(np.float32),
             rng.randint(0, 1000, SHAPE[0])) for _ in range(BATCHES)]


if __name__ == '__main__':
    data = load_batches()
    graph = resnet18(input_shape=list(SHAPE))

    fp32 = evaluate_classification(graph, data)
    print('fp32   :', fp32)

    quantize_graph(graph, [x for x, _ in data], calib_steps=BATCHES,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    int8 = evaluate_classification(graph, data)
    print('int8   :', int8)
    print(f"top-1 Δ: {(fp32['top1'] - int8['top1']) * 100:.2f}pt")
