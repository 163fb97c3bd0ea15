"""kernels/onnx_np.py — ONNX protobuf parse + numpy reference
execution: op-for-op parity with hand-computed references, the
op-granular seam, and a REAL ONNX det model driving the full OCR
pipeline byte-identically (no onnxruntime installed)."""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_ocr_spark.config import OCRConfig
from ragflow_ocr_spark.kernels import font5x7, onnx_np as ox
from ragflow_ocr_spark.kernels.ocr_pipeline import ocr_image


def _convnet(rng):
    w1 = rng.normal(0, 0.5, (4, 3, 3, 3)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (4,)).astype(np.float32)
    w2 = rng.normal(0, 0.5, (1, 4, 1, 1)).astype(np.float32)
    nodes = [
        ox.node_bytes("Conv", ["x", "w1", "b1"], ["c1"],
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1]),
        ox.node_bytes("Relu", ["c1"], ["r1"]),
        ox.node_bytes("Conv", ["r1", "w2"], ["c2"],
                      kernel_shape=[1, 1], pads=[0, 0, 0, 0], strides=[1, 1]),
        ox.node_bytes("Sigmoid", ["c2"], ["y"]),
    ]
    inits = [ox.tensor_bytes("w1", w1), ox.tensor_bytes("b1", b1),
             ox.tensor_bytes("w2", w2)]
    return ox.build_model(nodes, inits, "x", "y"), (w1, b1, w2)


def test_convnet_matches_manual_reference():
    rng = np.random.default_rng(7)
    model, (w1, b1, w2) = _convnet(rng)
    net = ox.NumpyOnnxNet(model)
    x = rng.normal(0, 1, (1, 3, 10, 12)).astype(np.float32)
    y = net.run(x)
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    c1 = np.zeros((1, 4, 10, 12), np.float32)
    for o in range(4):
        for i in range(3):
            for dy in range(3):
                for dx in range(3):
                    c1[0, o] += xp[0, i, dy : dy + 10, dx : dx + 12] * w1[o, i, dy, dx]
        c1[0, o] += b1[o]
    r1 = np.maximum(c1, 0)
    c2 = (r1 * w2[:, :, 0, 0].reshape(1, 4, 1, 1)).sum(axis=1, keepdims=True)
    ref = 1 / (1 + np.exp(-c2))
    assert y.shape == (1, 1, 10, 12)
    assert np.abs(y - ref).max() < 1e-5


def test_op_zoo_against_numpy():
    rng = np.random.default_rng(8)
    x = rng.normal(0, 1, (2, 6)).astype(np.float32)
    w = rng.normal(0, 1, (6, 5)).astype(np.float32)
    b = rng.normal(0, 1, (5,)).astype(np.float32)
    nodes = [
        ox.node_bytes("Gemm", ["x", "w", "b"], ["g"], alpha=1.0, beta=1.0),
        ox.node_bytes("Softmax", ["g"], ["y"], axis=-1),
    ]
    model = ox.build_model(nodes, [ox.tensor_bytes("w", w), ox.tensor_bytes("b", b)], "x", "y")
    y = ox.NumpyOnnxNet(model).run(x)
    g = x @ w + b
    e = np.exp(g - g.max(axis=-1, keepdims=True))
    assert np.abs(y - e / e.sum(axis=-1, keepdims=True)).max() < 1e-6
    assert np.abs(y.sum(axis=-1) - 1).max() < 1e-6


def test_pool_bn_concat_reshape():
    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, (1, 2, 8, 8)).astype(np.float32)
    scale = rng.normal(1, 0.1, (2,)).astype(np.float32)
    bias = rng.normal(0, 0.1, (2,)).astype(np.float32)
    mean = rng.normal(0, 0.5, (2,)).astype(np.float32)
    var = np.abs(rng.normal(1, 0.1, (2,))).astype(np.float32)
    nodes = [
        ox.node_bytes("BatchNormalization", ["x", "s", "b", "m", "v"], ["bn"], epsilon=1e-5),
        ox.node_bytes("MaxPool", ["bn"], ["mp"], kernel_shape=[2, 2], strides=[2, 2]),
        ox.node_bytes("AveragePool", ["bn"], ["ap"], kernel_shape=[2, 2], strides=[2, 2]),
        ox.node_bytes("Concat", ["mp", "ap"], ["cat"], axis=1),
        ox.node_bytes("Reshape", ["cat", "shape"], ["y"]),
    ]
    inits = [ox.tensor_bytes("s", scale), ox.tensor_bytes("b", bias),
             ox.tensor_bytes("m", mean), ox.tensor_bytes("v", var),
             ox.tensor_bytes("shape", np.array([1, 64], np.int64))]
    y = ox.NumpyOnnxNet(ox.build_model(nodes, inits, "x", "y")).run(x)
    bn = (x - mean.reshape(1, 2, 1, 1)) / np.sqrt(var.reshape(1, 2, 1, 1) + 1e-5)
    bn = bn * scale.reshape(1, 2, 1, 1) + bias.reshape(1, 2, 1, 1)
    mp = bn.reshape(1, 2, 4, 2, 4, 2).max(axis=(3, 5))
    ap = bn.reshape(1, 2, 4, 2, 4, 2).mean(axis=(3, 5))
    ref = np.concatenate([mp, ap], axis=1).reshape(1, 64)
    assert np.abs(y - ref).max() < 1e-5


def test_unsupported_op_is_named_seam():
    bad = ox.build_model([ox.node_bytes("GRU", ["x"], ["y"])], [], "x", "y")
    with pytest.raises(NotImplementedError, match="GRU"):
        ox.NumpyOnnxNet(bad)


def test_lstm_matches_manual_reference():
    rng = np.random.default_rng(10)
    seq, batch, inp, hid = 5, 2, 3, 4
    x = rng.normal(0, 1, (seq, batch, inp)).astype(np.float32)
    w = rng.normal(0, 0.5, (1, 4 * hid, inp)).astype(np.float32)
    r = rng.normal(0, 0.5, (1, 4 * hid, hid)).astype(np.float32)
    b = rng.normal(0, 0.1, (1, 8 * hid)).astype(np.float32)
    model = ox.build_model(
        [ox.node_bytes("LSTM", ["x", "w", "r", "b"], ["y", "yh", "yc"],
                       hidden_size=hid)],
        [ox.tensor_bytes("w", w), ox.tensor_bytes("r", r), ox.tensor_bytes("b", b)],
        "x", "y",
    )
    y = ox.NumpyOnnxNet(model).run(x)
    assert y.shape == (seq, 1, batch, hid)

    def sig(v):
        return 1 / (1 + np.exp(-v))

    wb = b[0, : 4 * hid] + b[0, 4 * hid :]
    wi, wo, wf, wc = (w[0][k * hid : (k + 1) * hid] for k in range(4))
    ri, ro, rf, rc = (r[0][k * hid : (k + 1) * hid] for k in range(4))
    bi, bo, bf, bc = (wb[k * hid : (k + 1) * hid] for k in range(4))
    h = np.zeros((batch, hid), np.float32)
    c = np.zeros((batch, hid), np.float32)
    for t in range(seq):
        i_g = sig(x[t] @ wi.T + h @ ri.T + bi)
        f_g = sig(x[t] @ wf.T + h @ rf.T + bf)
        c = f_g * c + i_g * np.tanh(x[t] @ wc.T + h @ rc.T + bc)
        o_g = sig(x[t] @ wo.T + h @ ro.T + bo)
        h = o_g * np.tanh(c)
        assert np.abs(y[t, 0] - h).max() < 1e-5


def test_bidirectional_lstm_crnn_head():
    """The CRNN head shape: features → BiLSTM → per-step projection —
    forward direction equals the unidirectional run, reverse direction
    equals running the flipped sequence."""
    rng = np.random.default_rng(11)
    seq, batch, inp, hid = 6, 1, 4, 3
    x = rng.normal(0, 1, (seq, batch, inp)).astype(np.float32)
    w = rng.normal(0, 0.5, (2, 4 * hid, inp)).astype(np.float32)
    r = rng.normal(0, 0.5, (2, 4 * hid, hid)).astype(np.float32)

    def run(direction, wd, rd):
        model = ox.build_model(
            [ox.node_bytes("LSTM", ["x", "w", "r"], ["y"],
                           hidden_size=hid, direction=direction)],
            [ox.tensor_bytes("w", wd), ox.tensor_bytes("r", rd)],
            "x", "y",
        )
        return ox.NumpyOnnxNet(model).run(x if direction != "_rev_input" else x)

    bi = run("bidirectional", w, r)
    fwd = run("forward", w[:1], r[:1])
    assert np.abs(bi[:, 0] - fwd[:, 0]).max() < 1e-6
    # reverse lane == forward lane over the time-flipped input
    model_f = ox.build_model(
        [ox.node_bytes("LSTM", ["x", "w", "r"], ["y"], hidden_size=hid)],
        [ox.tensor_bytes("w", w[1:]), ox.tensor_bytes("r", r[1:])],
        "x", "y",
    )
    rev_ref = ox.NumpyOnnxNet(model_f).run(x[::-1].copy())[::-1]
    assert np.abs(bi[:, 1] - rev_ref[:, 0]).max() < 1e-6


def test_conv_transpose_matches_naive_scatter():
    rng = np.random.default_rng(21)
    x = rng.normal(0, 1, (1, 2, 4, 5)).astype(np.float32)
    w = rng.normal(0, 0.5, (2, 3, 3, 3)).astype(np.float32)
    b = rng.normal(0, 0.1, (3,)).astype(np.float32)
    model = ox.build_model(
        [ox.node_bytes("ConvTranspose", ["x", "w", "b"], ["y"],
                       kernel_shape=[3, 3], strides=[2, 2],
                       pads=[1, 1, 1, 1], output_padding=[1, 1])],
        [ox.tensor_bytes("w", w), ox.tensor_bytes("b", b)], "x", "y",
    )
    y = ox.NumpyOnnxNet(model).run(x)
    oh, ow = (4 - 1) * 2 + 3 - 2 + 1, (5 - 1) * 2 + 3 - 2 + 1
    ref = np.zeros((1, 3, oh + 2, ow + 2), np.float32)
    for iy in range(4):
        for ix in range(5):
            for ky in range(3):
                for kx in range(3):
                    for co in range(3):
                        ref[0, co, iy * 2 + ky, ix * 2 + kx] += (
                            x[0, :, iy, ix] * w[:, co, ky, kx]
                        ).sum()
    ref = ref[:, :, 1 : 1 + oh, 1 : 1 + ow] + b.reshape(1, -1, 1, 1)
    assert y.shape == ref.shape and np.abs(y - ref).max() < 1e-4


def test_resize_nearest_asymmetric_is_pixel_repeat():
    rng = np.random.default_rng(22)
    x = rng.normal(0, 1, (1, 1, 3, 4)).astype(np.float32)
    m = ox.build_model(
        [ox.node_bytes("Resize", ["x", "roi", "scales"], ["y"],
                       mode="nearest",
                       coordinate_transformation_mode="asymmetric")],
        [ox.tensor_bytes("roi", np.array([], np.float32)),
         ox.tensor_bytes("scales", np.array([1, 1, 2, 2], np.float32))],
        "x", "y",
    )
    y = ox.NumpyOnnxNet(m).run(x)
    assert np.array_equal(y, np.repeat(np.repeat(x, 2, axis=2), 2, axis=3))


def test_mobilenetv3_se_block_and_dbnet_head_shapes():
    """Depthwise conv → HardSwish → squeeze-excite (GlobalAvgPool →
    1x1 convs → HardSigmoid → Mul) → stride-2 ConvTranspose → Sigmoid:
    the building blocks of a real exported DBNet-MobileNetV3."""
    rng = np.random.default_rng(23)
    C = 4
    x = rng.normal(0, 1, (1, C, 8, 8)).astype(np.float32)
    dw = rng.normal(0, 0.5, (C, 1, 3, 3)).astype(np.float32)
    se1 = rng.normal(0, 0.5, (C, C, 1, 1)).astype(np.float32)
    se2 = rng.normal(0, 0.5, (C, C, 1, 1)).astype(np.float32)
    up = rng.normal(0, 0.5, (C, 1, 2, 2)).astype(np.float32)
    nodes = [
        ox.node_bytes("Conv", ["x", "dw"], ["d"], kernel_shape=[3, 3],
                      pads=[1, 1, 1, 1], strides=[1, 1], group=C),
        ox.node_bytes("HardSwish", ["d"], ["h"]),
        ox.node_bytes("GlobalAveragePool", ["h"], ["g"]),
        ox.node_bytes("Conv", ["g", "se1"], ["s1"], kernel_shape=[1, 1],
                      pads=[0, 0, 0, 0], strides=[1, 1]),
        ox.node_bytes("Relu", ["s1"], ["s2"]),
        ox.node_bytes("Conv", ["s2", "se2"], ["s3"], kernel_shape=[1, 1],
                      pads=[0, 0, 0, 0], strides=[1, 1]),
        ox.node_bytes("HardSigmoid", ["s3"], ["gate"], alpha=0.2, beta=0.5),
        ox.node_bytes("Mul", ["h", "gate"], ["se"]),
        ox.node_bytes("ConvTranspose", ["se", "up"], ["u"],
                      kernel_shape=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0]),
        ox.node_bytes("Sigmoid", ["u"], ["y"]),
    ]
    inits = [ox.tensor_bytes(k, v)
             for k, v in [("dw", dw), ("se1", se1), ("se2", se2), ("up", up)]]
    y = ox.NumpyOnnxNet(ox.build_model(nodes, inits, "x", "y")).run(x)
    assert y.shape == (1, 1, 16, 16)
    assert (0 <= y).all() and (y <= 1).all()


def test_shape_gather_split_reduce_mean():
    rng = np.random.default_rng(24)
    x = rng.normal(0, 1, (1, 4, 8, 8)).astype(np.float32)
    nodes = [
        ox.node_bytes("Shape", ["x"], ["sh"]),
        ox.node_bytes("Gather", ["sh", "i"], ["g"], axis=0),
        ox.node_bytes("Split", ["x"], ["a", "bpart"], axis=1, split=[1, 3]),
        ox.node_bytes("ReduceMean", ["bpart"], ["y"], axes=[2, 3], keepdims=1),
    ]
    m = ox.build_model(nodes, [ox.tensor_bytes("i", np.array([1], np.int64))], "x", "y")
    y = ox.NumpyOnnxNet(m).run(x)
    assert y.shape == (1, 3, 1, 1)
    assert np.abs(y[0, :, 0, 0] - x[0, 1:4].mean(axis=(1, 2))).max() < 1e-6


def test_squeeze_unsqueeze_slice():
    rng = np.random.default_rng(12)
    x = rng.normal(0, 1, (3, 1, 5)).astype(np.float32)
    nodes = [
        ox.node_bytes("Squeeze", ["x"], ["s"], axes=[1]),        # (3, 5)
        ox.node_bytes("Unsqueeze", ["s"], ["u"], axes=[0]),      # (1, 3, 5)
        ox.node_bytes("Slice", ["u"], ["y"], starts=[1], ends=[4], axes=[2]),
    ]
    y = ox.NumpyOnnxNet(ox.build_model(nodes, [], "x", "y")).run(x)
    assert np.array_equal(y, x[:, 0, 1:4][None])


def _ink_det_model() -> bytes:
    """ONNX graph replicating the stub detector: denormalize channel 0
    (Conv 1x1 folds the ImageNet std/mean), threshold at gray 0.5 via a
    steep Sigmoid, 3x41 MaxPool dilation (the stub's separable line
    merge), scale to prob 0.95."""
    K = 400.0
    w = np.zeros((1, 3, 1, 1), np.float32)
    w[0, 0, 0, 0] = -K * 0.229
    b = np.array([K * (0.5 - 0.485)], np.float32)
    nodes = [
        ox.node_bytes("Conv", ["x", "w", "b"], ["logit"],
                      kernel_shape=[1, 1], pads=[0, 0, 0, 0], strides=[1, 1]),
        ox.node_bytes("Sigmoid", ["logit"], ["mask"]),
        ox.node_bytes("MaxPool", ["mask"], ["dil"],
                      kernel_shape=[3, 41], pads=[1, 20, 1, 20], strides=[1, 1]),
        ox.node_bytes("Mul", ["dil", "scale"], ["y"]),
    ]
    inits = [ox.tensor_bytes("w", w), ox.tensor_bytes("b", b),
             ox.tensor_bytes("scale", np.array(0.95, np.float32))]
    return ox.build_model(nodes, inits, "x", "y")


def test_real_onnx_det_model_through_full_pipeline():
    """A genuine ONNX protobuf model (Conv→Sigmoid→MaxPool→Mul) routed
    via OCRConfig.det_model executes in the det slot through
    _session_from_bytes and the page reads back byte-identically."""
    from ragflow_ocr_spark.kernels import infer
    from ragflow_ocr_spark.kernels.onnx_np import NumpyOnnxNet

    model = _ink_det_model()
    img, drawn = font5x7.render_page(
        ["ONNX DET NET PAGE", "SECOND LINE 77"], 960, 160, 2
    )
    r = ocr_image(img, OCRConfig(det_model=model))
    assert r.status == "ok"
    assert r.text == "\n".join(drawn)
    assert isinstance(infer.get_det_net(model), NumpyOnnxNet)


def test_malformed_onnx_bytes_raise_value_error():
    with pytest.raises(ValueError):
        ox.parse_model(b"\x08")  # truncated varint field
    with pytest.raises(ValueError):
        ox.parse_model(b"\x3b\xff\xff")  # bogus length-delimited
    with pytest.raises(ValueError):
        ox.parse_model(b"\x08\x01")  # valid ir_version, no graph


def test_resize_nearest_default_round_prefer_floor():
    """ONNX default nearest_mode is round_prefer_floor: exact .5 source
    coordinates round DOWN (ceil(x-0.5)), not up."""
    x = np.arange(4, dtype=np.float32).reshape(1, 1, 1, 4)
    # asymmetric + scale 1/2 thirds: pick a scale producing a .5 coord
    m = ox.build_model(
        [ox.node_bytes("Resize", ["x", "roi", "scales"], ["y"],
                       mode="nearest",
                       coordinate_transformation_mode="asymmetric")],
        [ox.tensor_bytes("roi", np.array([], np.float32)),
         ox.tensor_bytes("scales", np.array([1, 1, 1, 2], np.float32))],
        "x", "y",
    )
    y = ox.NumpyOnnxNet(m).run(x)
    # coords idx/2 = 0,.5,1,1.5,... → round_prefer_floor: 0,0,1,1,...
    assert np.array_equal(y[0, 0, 0], np.repeat(x[0, 0, 0], 2))
    # explicit round_prefer_ceil flips the ties up
    m2 = ox.build_model(
        [ox.node_bytes("Resize", ["x", "roi", "scales"], ["y"],
                       mode="nearest",
                       coordinate_transformation_mode="asymmetric",
                       nearest_mode="round_prefer_ceil")],
        [ox.tensor_bytes("roi", np.array([], np.float32)),
         ox.tensor_bytes("scales", np.array([1, 1, 1, 2], np.float32))],
        "x", "y",
    )
    y2 = ox.NumpyOnnxNet(m2).run(x)
    assert np.array_equal(y2[0, 0, 0], np.array([0, 1, 1, 2, 2, 3, 3, 3], np.float32))
