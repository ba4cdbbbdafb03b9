"""ProgramEntrance 1 — the automatic API (reference: ProgramEntrance_1.py).

Edit WORKING_DIRECTORY / MODEL / settings below and run. Expects an ONNX
model plus calibration data (npy files) in the working directory.
"""

import os

import numpy as np

from ppq_tpu import (TargetPlatform, export_ppq_graph,
                     QuantizationSettingFactory, quantize_onnx_model)
from ppq_tpu.quantization.analyse import graphwise_error_analyse

WORKING_DIRECTORY = 'working'
MODEL = 'model.onnx'
INPUT_SHAPE = [1, 3, 224, 224]
CALIBRATION_BATCHES = 32
TARGET_PLATFORM = TargetPlatform.TPU_INT8
EXPORT_PLATFORM = TargetPlatform.TPU_INT8


def load_calibration_dataset():
    data_dir = os.path.join(WORKING_DIRECTORY, 'data')
    if os.path.isdir(data_dir):
        # prefetching native npy loader (falls back to np.load)
        from ppq_tpu.utils.dataio import load_calibration_dir
        return list(load_calibration_dir(data_dir,
                                         limit=CALIBRATION_BATCHES))
    print('no calibration data found — using random calibration '
          '(accuracy will be meaningless).')
    return [np.random.randn(*INPUT_SHAPE).astype(np.float32)
            for _ in range(CALIBRATION_BATCHES)]


if __name__ == '__main__':
    model_path = os.path.join(WORKING_DIRECTORY, MODEL)
    if not os.path.exists(model_path):
        # first-run bootstrap: drop a demo ResNet-18 into the working
        # directory so the entrance runs end-to-end out of the box
        # (replace with your own model.onnx + data/*.npy)
        print(f'{model_path} not found — bootstrapping a demo ResNet-18.')
        os.makedirs(WORKING_DIRECTORY, exist_ok=True)
        from ppq_tpu.frontends.onnx import OnnxExporter
        from ppq_tpu.zoo.vision import resnet18
        OnnxExporter().export(model_path,
                              resnet18(input_shape=INPUT_SHAPE))
    loader = load_calibration_dataset()
    setting = QuantizationSettingFactory.tpu_setting()

    graph = quantize_onnx_model(
        os.path.join(WORKING_DIRECTORY, MODEL), loader,
        calib_steps=CALIBRATION_BATCHES, input_shape=INPUT_SHAPE,
        platform=TARGET_PLATFORM, setting=setting)

    graphwise_error_analyse(graph, loader, steps=8)

    export_ppq_graph(
        graph, EXPORT_PLATFORM,
        os.path.join(WORKING_DIRECTORY, 'quantized.onnx'),
        os.path.join(WORKING_DIRECTORY, 'quantized_cfg.json'))
