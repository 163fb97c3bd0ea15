"""Full-depth DBNet-MobileNetV3 / CRNN topologies through the
from-scratch ONNX executor (VERDICT round-2 item 8).

The round-2 suite proved the op set on building-block graphs; these
tests run graphs at REAL layer counts — a MobileNetV3-small backbone
(stem + 11 inverted-residual blocks with squeeze-excite, BN and
hard-swish throughout), a DBNet FPN neck + DB head (~140 nodes), and
a CRNN (7-conv VGG stack + 2 stacked BiLSTMs + FC, ~45 nodes) —
mirroring the reference's exported det/rec models
(``/root/reference/ocr/ocr.py:115-141`` session inputs).

Fixture strategy (generate-in-test rather than committed .onnx blobs):
the builders below ARE the fixture source — deterministic from a
seeded rng, so every run reconstructs byte-identical model bytes, and
the repo carries reviewable code instead of opaque binaries.

Determinism/byte-identity strategy: random weights at depth can't
read text, so the det graph threads an exact ink-logit lateral
(identical math to test_onnx_np._ink_det_model) and fuses the deep
head's output scaled by 1e-3 — every one of the ~140 nodes executes
real arithmetic and numerically contributes to the final map, but
cannot flip the steep-sigmoid threshold (logit gap ±200), so the full
OCR pipeline output stays byte-identical to the stub-detector golden.
The CRNN is pinned by output shape/finite-ness, per-machine argmax
determinism, and end-to-end execution through the micro-batched
recognize_crops path.
"""

from __future__ import annotations

import numpy as np

from ragflow_ocr_spark.config import OCRConfig
from ragflow_ocr_spark.kernels import font5x7
from ragflow_ocr_spark.kernels import onnx_np as ox
from ragflow_ocr_spark.kernels.ocr_pipeline import ocr_image, recognize_crops

# ------------------------------------------------------------ builders


def _w(rng, *shape, scale=0.1):
    return rng.normal(0, scale, shape).astype(np.float32)


class _G:
    """Tiny graph accumulator: names, nodes, initializers."""

    def __init__(self, rng):
        self.rng = rng
        self.nodes: list[bytes] = []
        self.inits: list[bytes] = []
        self.n = 0

    def t(self, prefix="t"):
        self.n += 1
        return f"{prefix}{self.n}"

    def init(self, arr, prefix="w"):
        name = self.t(prefix)
        self.inits.append(ox.tensor_bytes(name, arr))
        return name

    def node(self, op, inputs, out=None, **attrs):
        out = out or self.t()
        self.nodes.append(ox.node_bytes(op, inputs, [out], **attrs))
        return out

    def conv(self, x, cin, cout, k, stride=1, group=1, bias=False):
        w = self.init(_w(self.rng, cout, cin // group, k, k))
        ins = [x, w]
        if bias:
            ins.append(self.init(_w(self.rng, cout)))
        p = k // 2
        return self.node(
            "Conv", ins, kernel_shape=[k, k], pads=[p, p, p, p],
            strides=[stride, stride], group=group,
        )

    def bn(self, x, c):
        r = self.rng
        return self.node(
            "BatchNormalization",
            [
                x,
                self.init(r.normal(1, 0.1, c).astype(np.float32)),
                self.init(_w(r, c)),
                self.init(_w(r, c)),
                self.init(np.abs(r.normal(1, 0.05, c)).astype(np.float32)),
            ],
        )

    def mbv3_block(self, x, cin, cexp, cout, k, stride, se):
        """MobileNetV3 inverted residual: expand 1x1 → depthwise kxk →
        (SE) → project 1x1, hard-swish activations, residual add when
        shape-preserving."""
        h = self.conv(x, cin, cexp, 1)
        h = self.node("HardSwish", [self.bn(h, cexp)])
        h = self.conv(h, cexp, cexp, k, stride=stride, group=cexp)
        h = self.node("HardSwish", [self.bn(h, cexp)])
        if se:
            g = self.node("GlobalAveragePool", [h])
            g = self.node("Relu", [self.conv(g, cexp, max(cexp // 4, 1), 1, bias=True)])
            g = self.conv(g, max(cexp // 4, 1), cexp, 1, bias=True)
            g = self.node("HardSigmoid", [g], alpha=0.2, beta=0.5)
            h = self.node("Mul", [h, g])
        h = self.bn(self.conv(h, cexp, cout, 1), cout)
        if stride == 1 and cin == cout:
            h = self.node("Add", [x, h])
        return h


# MobileNetV3-small layout at ~1/4 channel width (keeps the in-test
# model <1 MB while preserving depth/op mix): (cexp, cout, k, stride, se)
_MBV3 = [
    (8, 8, 3, 2, True),
    (36, 12, 3, 2, False),
    (44, 12, 3, 1, False),
    (48, 16, 5, 2, True),
    (60, 16, 5, 1, True),
    (60, 16, 5, 1, True),
    (60, 20, 5, 1, True),
    (72, 20, 5, 1, True),
    (96, 24, 5, 2, True),
    (96, 24, 5, 1, True),
    (96, 24, 5, 1, True),
]


def deep_dbnet_bytes(perturb: float = 0.0) -> bytes:
    """Stem + 11 MBv3 blocks → FPN (lateral 1x1s, nearest upsample,
    3x3 smooth, concat) → DB head (conv-BN-relu + 2 stride-2
    ConvTranspose) fused at 1e-3 with the exact ink-logit lateral."""
    g = _G(np.random.default_rng(20260817))
    # exact ink lateral: logit = K*(0.5 - gray/255) on normalized ch0
    K = 400.0
    lw = np.zeros((1, 3, 1, 1), np.float32)
    lw[0, 0, 0, 0] = -K * 0.229
    lat = g.node(
        "Conv",
        ["x", g.init(lw), g.init(np.array([K * (0.5 - 0.485)], np.float32))],
        kernel_shape=[1, 1], pads=[0, 0, 0, 0], strides=[1, 1],
    )
    # backbone
    h = g.node("HardSwish", [g.bn(g.conv("x", 3, 8, 3, stride=2), 8)])
    taps = {}
    cin = 8
    stride_acc = 2
    for bi, (cexp, cout, k, s, se) in enumerate(_MBV3):
        h = g.mbv3_block(h, cin, cexp, cout, k, s, se)
        cin = cout
        stride_acc *= s
        taps[stride_acc] = (h, cout)  # last block at each stride wins
    # FPN: 1x1 laterals to 16ch, top-down nearest-upsample adds
    N = 16
    ins = {
        s: g.bn(g.conv(t, c, N, 1), N) for s, (t, c) in taps.items()
    }
    up2 = g.init(np.array([1, 1, 2, 2], np.float32), "sc")
    roi = g.init(np.array([], np.float32), "roi")

    def upsample(x, scales):
        return g.node(
            "Resize", [x, roi, scales], mode="nearest",
            coordinate_transformation_mode="asymmetric",
        )

    out16 = g.node("Add", [ins[16], upsample(ins[32], up2)])
    out8 = g.node("Add", [ins[8], upsample(out16, up2)])
    out4 = g.node("Add", [ins[4], upsample(out8, up2)])
    # per-level 3x3 smooth to N/4 then gather at /4
    p5 = upsample(
        g.conv(ins[32], N, N // 4, 3),
        g.init(np.array([1, 1, 8, 8], np.float32), "sc"),
    )
    p4 = upsample(
        g.conv(out16, N, N // 4, 3),
        g.init(np.array([1, 1, 4, 4], np.float32), "sc"),
    )
    p3 = upsample(g.conv(out8, N, N // 4, 3), up2)
    p2 = g.conv(out4, N, N // 4, 3)
    fuse = g.node("Concat", [p5, p4, p3, p2], axis=1)
    # DB head back to input resolution
    hd = g.node("Relu", [g.bn(g.conv(fuse, N, 4, 3), 4)])
    hd = g.node(
        "ConvTranspose", [hd, g.init(_w(g.rng, 4, 4, 2, 2))],
        kernel_shape=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0],
    )
    hd = g.node("Relu", [g.bn(hd, 4)])
    wlast = _w(g.rng, 4, 1, 2, 2)
    if perturb:
        wlast = wlast + np.float32(perturb)
    hd = g.node(
        "ConvTranspose", [hd, g.init(wlast)],
        kernel_shape=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0],
    )
    # fuse: lateral logit + 1e-3 * deep head → sigmoid → 0.95 → dilate
    eps = g.init(np.array(1e-3, np.float32), "eps")
    fused = g.node("Add", [lat, g.node("Mul", [hd, eps])])
    prob = g.node("Sigmoid", [fused])
    prob = g.node("Mul", [prob, g.init(np.array(0.95, np.float32), "s")])
    g.nodes.append(
        ox.node_bytes(
            "MaxPool", [prob], ["y"], kernel_shape=[3, 41],
            pads=[1, 20, 1, 20], strides=[1, 1],
        )
    )
    return ox.build_model(g.nodes, g.inits, "x", "y")


def deep_crnn_bytes() -> bytes:
    """CRNN at real depth: 7-conv VGG stack collapsing H=48 → 1
    (pools 2x2, 2x2, (2,1), (2,1), final valid-height conv), Squeeze +
    Transpose to (T, B, C), two stacked BiLSTMs (Split/Squeeze/Concat
    direction merge — the shape-agnostic export idiom), FC, and
    Transpose to the (B, T, classes) CTC layout recognize_crops
    expects."""
    from ragflow_ocr_spark.kernels.stubnet import N_CLASSES

    g = _G(np.random.default_rng(17))

    def cbr(x, cin, cout):
        return g.node("Relu", [g.bn(g.conv(x, cin, cout, 3), cout)])

    def pool(x, kh, kw, sh, sw):
        return g.node(
            "MaxPool", [x], kernel_shape=[kh, kw],
            pads=[0, 0, 0, 0], strides=[sh, sw],
        )

    h = pool(cbr("x", 3, 16), 2, 2, 2, 2)          # (16, 24, W/2)
    h = pool(cbr(h, 16, 32), 2, 2, 2, 2)           # (32, 12, W/4)
    h = cbr(h, 32, 48)
    h = pool(cbr(h, 48, 48), 2, 1, 2, 1)           # (48, 6, W/4)
    h = cbr(h, 48, 64)
    h = pool(cbr(h, 64, 64), 2, 1, 2, 1)           # (64, 3, W/4)
    w7 = g.init(_w(g.rng, 96, 64, 3, 3))
    h = g.node(                                     # valid-height → (96, 1, T)
        "Conv", [h, w7], kernel_shape=[3, 3],
        pads=[0, 1, 0, 1], strides=[1, 1],
    )
    h = g.node("Squeeze", [h], axes=[2])            # (B, 96, T)
    h = g.node("Transpose", [h], perm=[2, 0, 1])    # (T, B, 96)

    def bilstm(x, inp, hid):
        y = g.node(
            "LSTM",
            [
                x,
                g.init(_w(g.rng, 2, 4 * hid, inp, scale=0.2)),
                g.init(_w(g.rng, 2, 4 * hid, hid, scale=0.2)),
                g.init(_w(g.rng, 2, 8 * hid, scale=0.05)),
            ],
            hidden_size=hid, direction="bidirectional",
        )  # (T, 2, B, hid)
        self_nodes = g.nodes  # Split emits two outputs: append manually
        fw, bw = g.t(), g.t()
        self_nodes.append(ox.node_bytes("Split", [y], [fw, bw], axis=1))
        fw = g.node("Squeeze", [fw], axes=[1])
        bw = g.node("Squeeze", [bw], axes=[1])
        return g.node("Concat", [fw, bw], axis=2)   # (T, B, 2*hid)

    h = bilstm(h, 96, 48)
    h = bilstm(h, 96, 48)
    fc = g.init(_w(g.rng, 96, N_CLASSES, scale=0.2))
    h = g.node("MatMul", [h, fc])
    h = g.node("Add", [h, g.init(_w(g.rng, N_CLASSES, scale=0.05))])
    g.nodes.append(ox.node_bytes("Transpose", [h], ["y"], perm=[1, 0, 2]))
    return ox.build_model(g.nodes, g.inits, "x", "y")


# -------------------------------------------------------------- tests


def test_deep_dbnet_det_end_to_end_byte_identical():
    """~140-node MobileNetV3+FPN+DB-head model in the det slot: the
    full pipeline text equals the stub-detector golden byte-for-byte."""
    model = deep_dbnet_bytes()
    img, drawn = font5x7.render_page(
        ["DEEP DBNET BACKBONE", "SECOND LINE 2026"], 960, 160, 2
    )
    golden = ocr_image(img)  # stub det + stub rec
    assert golden.status == "ok" and golden.text == "\n".join(drawn)
    r = ocr_image(img, OCRConfig(det_model=model))
    assert r.status == "ok"
    assert r.text == golden.text
    assert r.boxes == golden.boxes


def test_deep_dbnet_backbone_actually_contributes():
    """Perturbing one head weight changes the raw probability map —
    the deep branch is numerically live, not dead code — while the
    thresholded pipeline text stays pinned (margin analysis in the
    module docstring)."""
    from ragflow_ocr_spark.kernels.onnx_np import NumpyOnnxNet

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (1, 3, 64, 96)).astype(np.float32)
    # put the exact lateral's logit near 0 (its sigmoid saturates to
    # exactly 0/1 on real ink/paper, hiding any epsilon) so the
    # 1e-3-scaled deep-head contribution is visible in the output
    x[0, 0] = 0.0655 + rng.normal(0, 0.01, (64, 96)).astype(np.float32)
    y0 = NumpyOnnxNet(deep_dbnet_bytes()).run(x)
    y1 = NumpyOnnxNet(deep_dbnet_bytes(perturb=0.05)).run(x)
    assert y0.shape == (1, 1, 64, 96)
    d = np.abs(y0 - y1).max()
    assert 0 < d < 0.05, d  # live but bounded far below the logit gap
    img, drawn = font5x7.render_page(["PERTURB STABLE 9"], 960, 96, 2)
    r = ocr_image(img, OCRConfig(det_model=deep_dbnet_bytes(perturb=0.05)))
    assert (r.status, r.text) == ("ok", "\n".join(drawn))


def test_deep_crnn_through_recognize_crops():
    """The full-depth CRNN executes through the real micro-batched rec
    path (ratio sort, dynamic pad width, CTC greedy): deterministic
    output, CTC-shaped logits, and the deep graph rebuilt from its
    seed is byte-identical."""
    from ragflow_ocr_spark.kernels.infer import get_rec_net
    from ragflow_ocr_spark.kernels.onnx_np import NumpyOnnxNet
    from ragflow_ocr_spark.kernels.stubnet import N_CLASSES

    model = deep_crnn_bytes()
    assert model == deep_crnn_bytes()  # fixture bytes are reproducible
    rng = np.random.default_rng(8)
    crops = [
        (rng.random((24 + 2 * i, 100 + 30 * i)) * 255).astype(np.uint8)
        for i in range(5)
    ]
    cfg = OCRConfig(rec_model=model)
    out1 = recognize_crops(crops, cfg)
    out2 = recognize_crops(crops, cfg)
    assert out1 == out2  # per-machine deterministic incl. scores
    assert len(out1) == 5
    assert all(isinstance(t, str) and 0.0 <= s <= 1.0 for t, s in out1)
    assert isinstance(get_rec_net(model), NumpyOnnxNet)
    # raw logits: CTC layout (B, T=W/4, classes), finite everywhere
    x = rng.normal(0, 1, (2, 3, 48, 320)).astype(np.float32)
    logits = NumpyOnnxNet(model).run(x)
    assert logits.shape == (2, 80, N_CLASSES)
    assert np.isfinite(logits).all()
