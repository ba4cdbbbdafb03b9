"""In-repo vision model zoo: ResNet-18, MobileNetV2 (ONNX-semantic graphs
with deterministic random weights). Mirrors the architectures behind the
reference's benchmark tables (BASELINE.md) so the PTQ pipeline is exercised
on realistic topologies: residual adds (scale alignment), depthwise convs
(per-channel quant), Clip/ReLU6 (activation fusion), GAP + Gemm heads.
"""

from __future__ import annotations

import numpy as np

from ..ir import BaseGraph
from .builder import NetBuilder


def resnet18(num_classes: int = 1000, input_shape=(1, 3, 224, 224),
             seed: int = 0) -> BaseGraph:
    b = NetBuilder('resnet18', seed)
    x = b.input('input', input_shape)

    def block(x, cin, cout, stride):
        y = b.relu(b.bn(b.conv(x, cin, cout, 3, stride), cout))
        y = b.bn(b.conv(y, cout, cout, 3, 1), cout)
        if stride != 1 or cin != cout:
            x = b.bn(b.conv(x, cin, cout, 1, stride, pad=0), cout)
        return b.relu(b.add(y, x))

    y = b.relu(b.bn(b.conv(x, 3, 64, 7, 2, pad=3), 64))
    y = b.maxpool(y, 3, 2, pad=1)
    for cin, cout, stride in [(64, 64, 1), (64, 64, 1),
                              (64, 128, 2), (128, 128, 1),
                              (128, 256, 2), (256, 256, 1),
                              (256, 512, 2), (512, 512, 1)]:
        y = block(y, cin, cout, stride)
    y = b.flatten(b.gap(y))
    y = b.gemm(y, 512, num_classes)
    b.output(y)
    return b.g


def mobilenet_v2(num_classes: int = 1000, input_shape=(1, 3, 224, 224),
                 seed: int = 0, width: float = 1.0) -> BaseGraph:
    b = NetBuilder('mobilenetv2', seed)
    x = b.input('input', input_shape)

    def c(ch):
        return max(8, int(ch * width) // 8 * 8)

    def conv_bn_relu6(x, cin, cout, k, stride, group=1):
        y = b.conv(x, cin, cout, k, stride, group=group)
        return b.relu6(b.bn(y, cout))

    def inverted_residual(x, cin, cout, stride, expand):
        hidden = cin * expand
        y = x
        if expand != 1:
            y = conv_bn_relu6(y, cin, hidden, 1, 1)
        y = conv_bn_relu6(y, hidden, hidden, 3, stride, group=hidden)  # depthwise
        y = b.bn(b.conv(y, hidden, cout, 1, 1, pad=0), cout)           # linear
        if stride == 1 and cin == cout:
            y = b.add(x, y)
        return y

    y = conv_bn_relu6(x, 3, c(32), 3, 2)
    settings = [  # t, c, n, s  (MobileNetV2 paper table 2)
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    cin = c(32)
    for t, ch, n, s in settings:
        for i in range(n):
            y = inverted_residual(y, cin, c(ch), s if i == 0 else 1, t)
            cin = c(ch)
    y = conv_bn_relu6(y, cin, c(1280), 1, 1)
    y = b.flatten(b.gap(y))
    y = b.gemm(y, c(1280), num_classes)
    b.output(y)
    return b.g


def tiny_cnn(num_classes: int = 10, input_shape=(1, 3, 32, 32),
             seed: int = 0) -> BaseGraph:
    """Small net for fast unit tests."""
    b = NetBuilder('tiny_cnn', seed)
    x = b.input('input', input_shape)
    y = b.relu(b.bn(b.conv(x, 3, 16, 3, 1), 16))
    skip = y
    y = b.relu(b.bn(b.conv(y, 16, 16, 3, 1), 16))
    y = b.add(y, skip)
    y = b.maxpool(y, 2, 2)
    y = b.flatten(b.gap(y))
    y = b.gemm(y, 16, num_classes)
    b.output(y)
    return b.g
