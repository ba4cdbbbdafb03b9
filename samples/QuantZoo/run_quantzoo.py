"""QuantZoo benchmark runner
(reference: ppq/samples/QuantZoo/ — the model × scheme matrix with
AQE / MQE / OQE quantization-error metrics, Readme.md:200-236).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import json

import numpy as np

from ppq_tpu.zoo import (bert_encoder, crnn_ocr, mobilenet_v2, resnet18,
                         tiny_cnn, yolo_lite)
from ppq_tpu.zoo.evaluate import quantzoo_benchmark

MODELS = {
    'resnet18': lambda: resnet18(input_shape=[1, 3, 224, 224]),
    'mobilenet_v2': lambda: mobilenet_v2(input_shape=(1, 3, 224, 224)),
    'yolo_lite': lambda: yolo_lite(num_classes=20, in_size=64),
    'bert_encoder': lambda: bert_encoder(seq_len=64, d_model=128,
                                         n_heads=4, n_layers=2, d_ff=256),
    'crnn_ocr': lambda: crnn_ocr(seq_len=16, hidden=32),
}

SHAPES = {
    'resnet18': (1, 3, 224, 224),
    'mobilenet_v2': (1, 3, 224, 224),
    'yolo_lite': (1, 3, 64, 64),
    'bert_encoder': (1, 64, 128),
    'crnn_ocr': (1, 1, 32, 64),
}

if __name__ == '__main__':
    if '--tasks' in _sys.argv:
        # trained-task scheme sweep: per family, the SAME trained model
        # quantized under INT8-PC / INT8-PT-PO2 / FP8-E4M3, reporting the
        # task metric plus AQE/MQE/OQE (reference QuantZoo Readme.md:200-236)
        import runpy
        proto = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), 'Imagenet',
            'accuracy_protocol.py')
        _sys.argv = [proto, '--schemes', '--cpu'] + \
            [a for a in _sys.argv[1:] if a not in ('--tasks',)]
        runpy.run_path(proto, run_name='__main__')
        _sys.exit(0)
    rng = np.random.RandomState(0)
    loaders = {name: [rng.randn(*shape).astype(np.float32)
                      for _ in range(8)]
               for name, shape in SHAPES.items()}
    records = quantzoo_benchmark(MODELS, loaders, calib_steps=8,
                                 error_steps=4)
    with open('quantzoo_results.json', 'w') as f:
        json.dump(records, f, indent=2)
    print(f'{len(records)} results → quantzoo_results.json')
