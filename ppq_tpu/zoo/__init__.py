"""Model zoo: deterministic ONNX-semantic test/benchmark models (the image
has no torchvision/model downloads — zero egress), one per BASELINE.json
config family."""

from .builder import NetBuilder
from .detection import yolo_lite
from .segmentation import deeplab_lite, srcnn, unet_lite
from .transformer import bert_encoder, crnn_ocr, mha_fused_encoder
from .vision import (mobilenet_v2, resnet18, resnext_lite,
                     se_resnet_lite, shufflenet_v2_lite, tiny_cnn)

__all__ = ['NetBuilder', 'yolo_lite', 'bert_encoder', 'crnn_ocr',
           'mha_fused_encoder', 'mobilenet_v2', 'resnet18', 'tiny_cnn',
           'deeplab_lite', 'srcnn', 'unet_lite', 'se_resnet_lite',
           'resnext_lite', 'shufflenet_v2_lite']
