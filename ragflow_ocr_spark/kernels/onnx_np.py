"""Minimal ONNX protobuf parser + numpy reference executor.

Closes more of the model seam: when onnxruntime is not installed,
real ``.onnx`` bytes no longer dead-end at a NotImplementedError —
the protobuf wire format is parsed for real (ModelProto → GraphProto →
nodes/initializers/attributes, no protobuf library needed) and graphs
built from a core op subset execute on numpy:

    Conv (2D, grouped/depthwise, pads/strides), ConvTranspose (the
    DBNet upsampling head), Resize (nearest/linear), Relu, LeakyRelu,
    HardSigmoid, HardSwish (MobileNetV3 backbones), Sigmoid, Tanh,
    MaxPool, AveragePool, GlobalAveragePool, Add, Sub, Mul, Div,
    MatMul, Gemm, BatchNormalization (inference), Concat, Reshape,
    Transpose, Flatten, Softmax, Identity, Constant, Clip, Pad(zero),
    LSTM (forward/reverse/bidirectional — the CRNN recurrent layer),
    Squeeze, Unsqueeze, Slice, Split, Shape, Gather, ReduceMean,
    Exp, Log, Sqrt, Neg, Abs, Pow

A graph using anything else raises NotImplementedError naming the op —
the documented seam, now op-granular instead of format-granular. This
is a REFERENCE executor (correctness, not speed): production inference
uses onnxruntime (``kernels/infer.OrtNet``); this path exists so the
pipeline can run real small models offline and so tests can pin the
ONNX routing end to end with handcrafted fixture models.

Wire format: protobuf encoding (varints + length-delimited fields) per
the public ONNX schema field numbers (onnx.proto).
"""

from __future__ import annotations

import struct

import numpy as np

# TensorProto.DataType
_DT_FLOAT = 1
_DT_INT64 = 7
_DT_INT32 = 6


# ------------------------------------------------------------ wire reader
def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated protobuf varint")
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("overlong protobuf varint")


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value). value: int for varint/
    fixed, bytes for length-delimited."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, i = _read_varint(buf, i)
            yield field, wt, v
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError("truncated protobuf field")
            yield field, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            if i + 4 > n:
                raise ValueError("truncated protobuf fixed32")
            yield field, wt, int.from_bytes(buf[i : i + 4], "little")
            i += 4
        elif wt == 1:  # fixed64
            if i + 8 > n:
                raise ValueError("truncated protobuf fixed64")
            yield field, wt, int.from_bytes(buf[i : i + 8], "little")
            i += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    """TensorProto → (name, ndarray). Fields: dims=1, data_type=2,
    float_data=4, int32_data=5, int64_data=7, name=8, raw_data=9."""
    dims: list[int] = []
    dtype = _DT_FLOAT
    name = ""
    raw = None
    float_data: list[float] = []
    int_data: list[int] = []
    for field, wt, v in _fields(buf):
        if field == 1:
            dims.append(v if wt == 0 else int.from_bytes(v, "little"))
        elif field == 2:
            dtype = v
        elif field == 4:
            if wt == 2:  # packed floats
                float_data.extend(
                    struct.unpack(f"<{len(v) // 4}f", v)
                )
            else:
                float_data.append(struct.unpack("<f", struct.pack("<I", v))[0])
        elif field in (5, 7):
            if wt == 2:  # packed varints
                i = 0
                while i < len(v):
                    val, i = _read_varint(v, i)
                    int_data.append(val)
            else:
                int_data.append(v)
        elif field == 8:
            name = v.decode("utf-8")
        elif field == 9:
            raw = v
    if dtype == _DT_FLOAT:
        if raw is not None:
            arr = np.frombuffer(raw, "<f4")
        else:
            arr = np.array(float_data, "<f4")
    elif dtype in (_DT_INT64, _DT_INT32):
        width = "<i8" if dtype == _DT_INT64 else "<i4"
        if raw is not None:
            arr = np.frombuffer(raw, width)
        else:
            # protobuf varints are two's-complement-encoded as uint64
            arr = np.array(int_data, np.uint64).astype(np.int64)
    else:
        raise NotImplementedError(f"ONNX tensor dtype {dtype} unsupported")
    return name, arr.reshape(dims) if dims else arr


def _parse_attr(buf: bytes) -> tuple[str, object]:
    """AttributeProto: name=1, f=2, i=3, s=4, t=5, floats=7, ints=8."""
    name = ""
    val: object = None
    ints: list[int] = []
    floats: list[float] = []
    for field, wt, v in _fields(buf):
        if field == 1:
            name = v.decode("utf-8")
        elif field == 2:
            val = struct.unpack("<f", struct.pack("<I", v))[0]
        elif field == 3:
            # zigzag-free int64: interpret as two's complement
            val = v - (1 << 64) if v >= 1 << 63 else v
        elif field == 4:
            val = v
        elif field == 5:
            val = _parse_tensor(v)[1]
        elif field == 7:
            if wt == 2:
                floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
            else:
                floats.append(struct.unpack("<f", struct.pack("<I", v))[0])
        elif field == 9:  # repeated strings
            if val is None:
                val = []
            val.append(v)
        elif field == 8:
            if wt == 2:
                i = 0
                while i < len(v):
                    x, i = _read_varint(v, i)
                    ints.append(x - (1 << 64) if x >= 1 << 63 else x)
            else:
                ints.append(v - (1 << 64) if v >= 1 << 63 else v)
    if ints:
        val = ints
    elif floats:
        val = floats
    return name, val


def _value_info_name(buf: bytes) -> str:
    for field, _wt, v in _fields(buf):
        if field == 1:
            return v.decode("utf-8")
    return ""


class _Node:
    __slots__ = ("op", "inputs", "outputs", "attrs")

    def __init__(self, buf: bytes):
        self.inputs: list[str] = []
        self.outputs: list[str] = []
        self.op = ""
        self.attrs: dict[str, object] = {}
        for field, _wt, v in _fields(buf):
            if field == 1:
                self.inputs.append(v.decode("utf-8"))
            elif field == 2:
                self.outputs.append(v.decode("utf-8"))
            elif field == 4:
                self.op = v.decode("utf-8")
            elif field == 7:
                k, a = _parse_attr(v)
                self.attrs[k] = a


class Graph:
    def __init__(self, buf: bytes):
        self.nodes: list[_Node] = []
        self.initializers: dict[str, np.ndarray] = {}
        self.inputs: list[str] = []
        self.outputs: list[str] = []
        for field, _wt, v in _fields(buf):
            if field == 1:
                self.nodes.append(_Node(v))
            elif field == 5:
                name, arr = _parse_tensor(v)
                self.initializers[name] = arr
            elif field == 11:
                self.inputs.append(_value_info_name(v))
            elif field == 12:
                self.outputs.append(_value_info_name(v))
        # graph "inputs" include initializers in some exports
        self.inputs = [i for i in self.inputs if i not in self.initializers]


def parse_model(data: bytes) -> Graph:
    """ModelProto bytes → Graph (field 7 = graph)."""
    for field, _wt, v in _fields(data):
        if field == 7:
            return Graph(v)
    raise ValueError("ONNX model has no graph")


# --------------------------------------------------------------- executor
def _conv2d(x, w, b, pads, strides, group):
    n, cin, h, wid = x.shape
    cout, cin_g, kh, kw = w.shape
    pt, pl, pb, pr = pads
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    sh, sw = strides
    oh = (xp.shape[2] - kh) // sh + 1
    ow = (xp.shape[3] - kw) // sw + 1
    win = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(2, 3))
    win = win[:, :, ::sh, ::sw]  # (n, cin, oh, ow, kh, kw)
    out = np.empty((n, cout, oh, ow), dtype=np.float32)
    cpg_out = cout // group
    for g in range(group):
        xg = win[:, g * cin_g : (g + 1) * cin_g]
        wg = w[g * cpg_out : (g + 1) * cpg_out]
        out[:, g * cpg_out : (g + 1) * cpg_out] = np.einsum(
            "nchwij,ocij->nohw", xg, wg, optimize=True
        )
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out


def _pool2d(x, kernel, pads, strides, mode):
    kh, kw = kernel
    pt, pl, pb, pr = pads
    fill = -np.inf if mode == "max" else 0.0
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)), constant_values=fill)
    sh, sw = strides
    win = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(2, 3))
    win = win[:, :, ::sh, ::sw]
    return win.max(axis=(-2, -1)) if mode == "max" else win.mean(axis=(-2, -1))


class NumpyOnnxNet:
    """Net-protocol executor over a parsed ONNX graph. Raises
    NotImplementedError (the seam) on any unsupported op."""

    def __init__(self, model_bytes: bytes):
        self.graph = parse_model(model_bytes)
        unsupported = sorted(
            {n.op for n in self.graph.nodes} - set(_OPS)
        )
        if unsupported:
            raise NotImplementedError(
                f"ONNX ops not in the numpy reference executor: "
                f"{unsupported}; install onnxruntime for full coverage"
            )
        if len(self.graph.inputs) != 1:
            raise NotImplementedError("executor expects exactly one graph input")

    def run(self, x: np.ndarray) -> np.ndarray:
        env: dict[str, np.ndarray] = dict(self.graph.initializers)
        env[self.graph.inputs[0]] = np.ascontiguousarray(x, dtype=np.float32)
        for node in self.graph.nodes:
            _OPS[node.op](node, env)
        return env[self.graph.outputs[0]]


def _op_conv(n, env):
    x = env[n.inputs[0]]
    w = env[n.inputs[1]].astype(np.float32)
    b = env[n.inputs[2]].astype(np.float32) if len(n.inputs) > 2 else None
    kh, kw = w.shape[2], w.shape[3]
    pads = n.attrs.get("pads", [0, 0, 0, 0])
    strides = n.attrs.get("strides", [1, 1])
    dil = n.attrs.get("dilations", [1, 1])
    if list(dil) != [1, 1]:
        raise NotImplementedError("Conv dilation != 1 unsupported")
    group = int(n.attrs.get("group", 1))
    ks = n.attrs.get("kernel_shape", [kh, kw])
    if list(ks) != [kh, kw]:
        raise ValueError("Conv kernel_shape mismatch")
    env[n.outputs[0]] = _conv2d(x, w, b, pads, strides, group)


def _op_pool(mode):
    def op(n, env):
        x = env[n.inputs[0]]
        kernel = n.attrs["kernel_shape"]
        pads = n.attrs.get("pads", [0, 0, 0, 0])
        strides = n.attrs.get("strides", kernel)
        env[n.outputs[0]] = _pool2d(x, kernel, pads, strides, mode).astype(
            np.float32
        )

    return op


def _op_bn(n, env):
    x = env[n.inputs[0]]
    scale, b, mean, var = (env[n.inputs[k]] for k in range(1, 5))
    eps = float(n.attrs.get("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    env[n.outputs[0]] = (
        (x - mean.reshape(shape))
        / np.sqrt(var.reshape(shape) + eps)
        * scale.reshape(shape)
        + b.reshape(shape)
    ).astype(np.float32)


def _op_gemm(n, env):
    a = env[n.inputs[0]]
    b = env[n.inputs[1]]
    alpha = float(n.attrs.get("alpha", 1.0))
    beta = float(n.attrs.get("beta", 1.0))
    if n.attrs.get("transA", 0):
        a = a.T
    if n.attrs.get("transB", 0):
        b = b.T
    out = alpha * (a @ b)
    if len(n.inputs) > 2:
        out = out + beta * env[n.inputs[2]]
    env[n.outputs[0]] = out.astype(np.float32)


def _op_softmax(n, env):
    x = env[n.inputs[0]]
    axis = int(n.attrs.get("axis", -1))
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    env[n.outputs[0]] = (e / e.sum(axis=axis, keepdims=True)).astype(np.float32)


def _op_pad(n, env):
    x = env[n.inputs[0]]
    pads = n.attrs.get("pads")
    if pads is None:  # opset-11 style: pads as second input
        pads = env[n.inputs[1]].tolist()
    k = x.ndim
    pairs = [(int(pads[i]), int(pads[i + k])) for i in range(k)]
    env[n.outputs[0]] = np.pad(x, pairs)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -88.0, 88.0)))


def _op_lstm(n, env):
    """ONNX LSTM, default activations (σ, tanh, tanh), gate order
    iofc, forward / reverse / bidirectional — the CRNN recurrent
    layer. Peepholes and per-gate activation overrides unsupported."""
    x = env[n.inputs[0]]  # (seq, batch, input)
    w = env[n.inputs[1]].astype(np.float32)  # (dirs, 4H, input)
    r = env[n.inputs[2]].astype(np.float32)  # (dirs, 4H, H)
    hidden = int(n.attrs.get("hidden_size", r.shape[2]))
    direction = (
        n.attrs.get("direction", b"forward").decode()
        if isinstance(n.attrs.get("direction"), bytes)
        else n.attrs.get("direction", "forward")
    )
    dirs = 2 if direction == "bidirectional" else 1
    seq, batch, _ = x.shape
    b = (
        env[n.inputs[3]].astype(np.float32)
        if len(n.inputs) > 3 and n.inputs[3]
        else np.zeros((dirs, 8 * hidden), np.float32)
    )
    if "activations" in n.attrs:
        acts = [
            a.decode() if isinstance(a, bytes) else a
            for a in n.attrs["activations"]
        ]
        if acts[: 3 * dirs] != ["Sigmoid", "Tanh", "Tanh"] * dirs:
            raise NotImplementedError("LSTM activation overrides unsupported")
    y = np.zeros((seq, dirs, batch, hidden), np.float32)
    y_h = np.zeros((dirs, batch, hidden), np.float32)
    y_c = np.zeros((dirs, batch, hidden), np.float32)
    for d in range(dirs):
        wb = b[d, : 4 * hidden] + b[d, 4 * hidden :]
        wi, wo, wf, wc = (w[d][k * hidden : (k + 1) * hidden] for k in range(4))
        ri, ro, rf, rc = (r[d][k * hidden : (k + 1) * hidden] for k in range(4))
        bi, bo, bf, bc = (wb[k * hidden : (k + 1) * hidden] for k in range(4))
        h_t = np.zeros((batch, hidden), np.float32)
        c_t = np.zeros((batch, hidden), np.float32)
        reverse = direction == "reverse" or d == 1
        steps = range(seq - 1, -1, -1) if reverse else range(seq)
        for t in steps:
            xt = x[t]
            i_g = _sigmoid(xt @ wi.T + h_t @ ri.T + bi)
            f_g = _sigmoid(xt @ wf.T + h_t @ rf.T + bf)
            c_hat = np.tanh(xt @ wc.T + h_t @ rc.T + bc)
            c_t = f_g * c_t + i_g * c_hat
            o_g = _sigmoid(xt @ wo.T + h_t @ ro.T + bo)
            h_t = o_g * np.tanh(c_t)
            y[t, d] = h_t
        y_h[d] = h_t
        y_c[d] = c_t
    env[n.outputs[0]] = y
    if len(n.outputs) > 1 and n.outputs[1]:
        env[n.outputs[1]] = y_h
    if len(n.outputs) > 2 and n.outputs[2]:
        env[n.outputs[2]] = y_c


def _op_squeeze(n, env):
    x = env[n.inputs[0]]
    axes = n.attrs.get("axes")
    if axes is None and len(n.inputs) > 1:
        axes = [int(a) for a in env[n.inputs[1]]]
    if axes is None:
        env[n.outputs[0]] = np.squeeze(x)
    else:
        env[n.outputs[0]] = np.squeeze(x, axis=tuple(int(a) for a in axes))


def _op_unsqueeze(n, env):
    x = env[n.inputs[0]]
    axes = n.attrs.get("axes")
    if axes is None:
        axes = [int(a) for a in env[n.inputs[1]]]
    out = x
    for a in sorted(int(a) for a in axes):
        out = np.expand_dims(out, a)
    env[n.outputs[0]] = out


def _op_slice(n, env):
    x = env[n.inputs[0]]
    if "starts" in n.attrs:  # opset-1 style
        starts = n.attrs["starts"]
        ends = n.attrs["ends"]
        axes = n.attrs.get("axes", list(range(len(starts))))
        steps = [1] * len(starts)
    else:  # opset-10+: inputs
        starts = [int(v) for v in env[n.inputs[1]]]
        ends = [int(v) for v in env[n.inputs[2]]]
        axes = (
            [int(v) for v in env[n.inputs[3]]]
            if len(n.inputs) > 3
            else list(range(len(starts)))
        )
        steps = (
            [int(v) for v in env[n.inputs[4]]]
            if len(n.inputs) > 4
            else [1] * len(starts)
        )
    sl = [slice(None)] * x.ndim
    for a, s, e, st in zip(axes, starts, ends, steps):
        sl[a] = slice(s, e, st)
    env[n.outputs[0]] = x[tuple(sl)]


def _op_clip(n, env):
    x = env[n.inputs[0]]
    lo = float(env[n.inputs[1]]) if len(n.inputs) > 1 else n.attrs.get("min", -np.inf)
    hi = float(env[n.inputs[2]]) if len(n.inputs) > 2 else n.attrs.get("max", np.inf)
    env[n.outputs[0]] = np.clip(x, lo, hi)


def _op_conv_transpose(n, env):
    """2D ConvTranspose (DBNet's upsampling head): scatter-add per
    kernel tap, grouped. W layout (cin, cout/g, kh, kw)."""
    x = env[n.inputs[0]]
    w = env[n.inputs[1]].astype(np.float32)
    b = env[n.inputs[2]].astype(np.float32) if len(n.inputs) > 2 else None
    nb, cin, h, wid = x.shape
    _cin_w, cout_g, kh, kw = w.shape
    group = int(n.attrs.get("group", 1))
    cout = cout_g * group
    sh, sw = n.attrs.get("strides", [1, 1])
    pt, pl, pb, pr = n.attrs.get("pads", [0, 0, 0, 0])
    opad = n.attrs.get("output_padding", [0, 0])
    if list(n.attrs.get("dilations", [1, 1])) != [1, 1]:
        raise NotImplementedError("ConvTranspose dilation != 1 unsupported")
    oh = (h - 1) * sh + kh - pt - pb + opad[0]
    ow = (wid - 1) * sw + kw - pl - pr + opad[1]
    out = np.zeros((nb, cout, oh + pt + pb, ow + pl + pr), np.float32)
    cin_g = cin // group
    for g in range(group):
        xg = x[:, g * cin_g : (g + 1) * cin_g]  # (n, cin_g, h, w)
        wg = w[g * cin_g : (g + 1) * cin_g]     # (cin_g, cout_g, kh, kw)
        for ky in range(kh):
            for kx in range(kw):
                contrib = np.einsum(
                    "nchw,co->nohw", xg, wg[:, :, ky, kx], optimize=True
                )
                out[
                    :,
                    g * cout_g : (g + 1) * cout_g,
                    ky : ky + (h - 1) * sh + 1 : sh,
                    kx : kx + (wid - 1) * sw + 1 : sw,
                ] += contrib
    out = out[:, :, pt : pt + oh, pl : pl + ow]
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    env[n.outputs[0]] = out


def _op_resize(n, env):
    """Resize (nearest / linear) with scales or sizes; half_pixel and
    asymmetric coordinate modes — the DBNet FPN upsample."""
    x = env[n.inputs[0]]
    scales = None
    sizes = None
    if len(n.inputs) > 2 and n.inputs[2] and len(env[n.inputs[2]]) > 0:
        scales = np.asarray(env[n.inputs[2]], np.float64)
    if len(n.inputs) > 3 and n.inputs[3]:
        sizes = [int(v) for v in env[n.inputs[3]]]
    mode = n.attrs.get("mode", b"nearest")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    ctm = n.attrs.get("coordinate_transformation_mode", b"half_pixel")
    ctm = ctm.decode() if isinstance(ctm, bytes) else ctm
    nb, c, h, w = x.shape
    if sizes is not None:
        oh, ow = sizes[2], sizes[3]
    else:
        oh = int(np.floor(h * scales[2]))
        ow = int(np.floor(w * scales[3]))

    def src_coords(o, s, out_len, in_len):
        idx = np.arange(out_len, dtype=np.float64)
        if ctm == "asymmetric":
            return idx / s
        if ctm == "align_corners":
            return idx * (in_len - 1) / max(out_len - 1, 1)
        return (idx + 0.5) / s - 0.5  # half_pixel

    sy = oh / h if sizes is not None else scales[2]
    sx = ow / w if sizes is not None else scales[3]
    ys = src_coords(None, sy, oh, h)
    xs = src_coords(None, sx, ow, w)
    if mode == "nearest":
        nm = n.attrs.get("nearest_mode", b"round_prefer_floor")
        nm = nm.decode() if isinstance(nm, bytes) else nm

        def _round(v):
            if nm == "round_prefer_ceil":
                return np.floor(v + 0.5)
            if nm == "floor":
                return np.floor(v)
            if nm == "ceil":
                return np.ceil(v)
            return np.ceil(v - 0.5)  # round_prefer_floor (ONNX default)

        yi = np.clip(_round(ys), 0, h - 1).astype(int)
        xi = np.clip(_round(xs), 0, w - 1).astype(int)
        env[n.outputs[0]] = x[:, :, yi][:, :, :, xi]
        return
    if mode != "linear":
        raise NotImplementedError(f"Resize mode {mode!r} unsupported")
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fy = np.clip(ys - y0, 0, 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fx = np.clip(xs - x0, 0, 1)
    top = x[:, :, y0][:, :, :, x0] * (1 - fx) + x[:, :, y0][:, :, :, x1] * fx
    bot = x[:, :, y1][:, :, :, x0] * (1 - fx) + x[:, :, y1][:, :, :, x1] * fx
    env[n.outputs[0]] = (
        top * (1 - fy[None, None, :, None]) + bot * fy[None, None, :, None]
    ).astype(np.float32)


def _op_split(n, env):
    x = env[n.inputs[0]]
    axis = int(n.attrs.get("axis", 0))
    if "split" in n.attrs:
        parts = [int(v) for v in n.attrs["split"]]
    elif len(n.inputs) > 1 and n.inputs[1]:
        parts = [int(v) for v in env[n.inputs[1]]]
    else:
        k = len(n.outputs)
        parts = [x.shape[axis] // k] * k
    offs = np.cumsum([0] + parts)
    for i, out in enumerate(n.outputs):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(int(offs[i]), int(offs[i + 1]))
        env[out] = x[tuple(sl)]


def _op_reduce_mean(n, env):
    x = env[n.inputs[0]]
    axes = n.attrs.get("axes")
    if axes is None and len(n.inputs) > 1 and n.inputs[1]:
        axes = [int(v) for v in env[n.inputs[1]]]
    keep = bool(n.attrs.get("keepdims", 1))
    axes_t = tuple(int(a) for a in axes) if axes is not None else None
    env[n.outputs[0]] = x.mean(axis=axes_t, keepdims=keep).astype(np.float32)


_OPS = {
    "Conv": _op_conv,
    "MaxPool": _op_pool("max"),
    "AveragePool": _op_pool("avg"),
    "GlobalAveragePool": lambda n, env: env.__setitem__(
        n.outputs[0], env[n.inputs[0]].mean(axis=(2, 3), keepdims=True)
    ),
    "Relu": lambda n, env: env.__setitem__(
        n.outputs[0], np.maximum(env[n.inputs[0]], 0)
    ),
    "LeakyRelu": lambda n, env: env.__setitem__(
        n.outputs[0],
        np.where(
            env[n.inputs[0]] > 0,
            env[n.inputs[0]],
            env[n.inputs[0]] * n.attrs.get("alpha", 0.01),
        ).astype(np.float32),
    ),
    "Sigmoid": lambda n, env: env.__setitem__(
        n.outputs[0],
        (
            1.0 / (1.0 + np.exp(-np.clip(env[n.inputs[0]], -88.0, 88.0)))
        ).astype(np.float32),
    ),
    "Tanh": lambda n, env: env.__setitem__(
        n.outputs[0], np.tanh(env[n.inputs[0]]).astype(np.float32)
    ),
    "Add": lambda n, env: env.__setitem__(
        n.outputs[0], env[n.inputs[0]] + env[n.inputs[1]]
    ),
    "Sub": lambda n, env: env.__setitem__(
        n.outputs[0], env[n.inputs[0]] - env[n.inputs[1]]
    ),
    "Mul": lambda n, env: env.__setitem__(
        n.outputs[0], env[n.inputs[0]] * env[n.inputs[1]]
    ),
    "Div": lambda n, env: env.__setitem__(
        n.outputs[0], env[n.inputs[0]] / env[n.inputs[1]]
    ),
    "MatMul": lambda n, env: env.__setitem__(
        n.outputs[0], (env[n.inputs[0]] @ env[n.inputs[1]]).astype(np.float32)
    ),
    "Gemm": _op_gemm,
    "BatchNormalization": _op_bn,
    "Concat": lambda n, env: env.__setitem__(
        n.outputs[0],
        np.concatenate(
            [env[i] for i in n.inputs], axis=int(n.attrs.get("axis", 0))
        ),
    ),
    "Reshape": lambda n, env: env.__setitem__(
        n.outputs[0],
        env[n.inputs[0]].reshape(
            [int(d) for d in env[n.inputs[1]]]
        ),
    ),
    "Transpose": lambda n, env: env.__setitem__(
        n.outputs[0],
        np.transpose(env[n.inputs[0]], n.attrs.get("perm")),
    ),
    "Flatten": lambda n, env: env.__setitem__(
        n.outputs[0],
        env[n.inputs[0]].reshape(env[n.inputs[0]].shape[0], -1),
    ),
    "Softmax": _op_softmax,
    "Identity": lambda n, env: env.__setitem__(n.outputs[0], env[n.inputs[0]]),
    "Constant": lambda n, env: env.__setitem__(
        n.outputs[0], np.asarray(n.attrs["value"])
    ),
    "Pad": _op_pad,
    "Clip": _op_clip,
    "LSTM": _op_lstm,
    "Squeeze": _op_squeeze,
    "Unsqueeze": _op_unsqueeze,
    "Slice": _op_slice,
    "ConvTranspose": _op_conv_transpose,
    "Resize": _op_resize,
    "Split": _op_split,
    "ReduceMean": _op_reduce_mean,
    "Shape": lambda n, env: env.__setitem__(
        n.outputs[0], np.array(env[n.inputs[0]].shape, np.int64)
    ),
    "Gather": lambda n, env: env.__setitem__(
        n.outputs[0],
        np.take(
            env[n.inputs[0]],
            np.asarray(env[n.inputs[1]], np.int64),
            axis=int(n.attrs.get("axis", 0)),
        ),
    ),
    "HardSigmoid": lambda n, env: env.__setitem__(
        n.outputs[0],
        np.clip(
            n.attrs.get("alpha", 0.2) * env[n.inputs[0]] + n.attrs.get("beta", 0.5),
            0.0,
            1.0,
        ).astype(np.float32),
    ),
    "HardSwish": lambda n, env: env.__setitem__(
        n.outputs[0],
        (
            env[n.inputs[0]]
            * np.clip(env[n.inputs[0]] / 6.0 + 0.5, 0.0, 1.0)
        ).astype(np.float32),
    ),
    "Exp": lambda n, env: env.__setitem__(
        n.outputs[0], np.exp(np.clip(env[n.inputs[0]], -88.0, 88.0)).astype(np.float32)
    ),
    "Log": lambda n, env: env.__setitem__(
        n.outputs[0], np.log(env[n.inputs[0]]).astype(np.float32)
    ),
    "Sqrt": lambda n, env: env.__setitem__(
        n.outputs[0], np.sqrt(env[n.inputs[0]]).astype(np.float32)
    ),
    "Neg": lambda n, env: env.__setitem__(n.outputs[0], -env[n.inputs[0]]),
    "Abs": lambda n, env: env.__setitem__(n.outputs[0], np.abs(env[n.inputs[0]])),
    "Pow": lambda n, env: env.__setitem__(
        n.outputs[0],
        np.power(env[n.inputs[0]], env[n.inputs[1]]).astype(np.float32),
    ),
}


# ------------------------------------------------------- fixture writer
def _varint_b(v: int) -> bytes:
    if v < 0:  # protobuf int64: negatives as 64-bit two's complement
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint_b((field << 3) | 2) + _varint_b(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _varint_b(field << 3) + _varint_b(value)


def tensor_bytes(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b"".join(_vi(1, int(d)) for d in arr.shape)
    if arr.dtype.kind == "f":
        out += _vi(2, _DT_FLOAT)
        out += _ld(9, np.ascontiguousarray(arr, "<f4").tobytes())
    else:
        out += _vi(2, _DT_INT64)
        out += _ld(9, np.ascontiguousarray(arr, "<i8").tobytes())
    out += _ld(8, name.encode())
    return out


def _attr_bytes(name: str, value) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(value, (list, tuple)):
        if value and isinstance(value[0], (str, bytes)):
            for v in value:
                out += _ld(9, v.encode() if isinstance(v, str) else v)
        else:
            for v in value:
                out += _vi(8, int(v))
    elif isinstance(value, float):
        out += _varint_b((2 << 3) | 5) + struct.pack("<f", value)
    elif isinstance(value, bool):
        out += _vi(3, int(value))
    elif isinstance(value, int):
        out += _vi(3, value)
    elif isinstance(value, str):
        out += _ld(4, value.encode())
    elif isinstance(value, bytes):
        out += _ld(4, value)
    elif isinstance(value, np.ndarray):
        out += _ld(5, tensor_bytes("", value))
    else:
        raise TypeError(type(value))
    return out


def node_bytes(op: str, inputs, outputs, **attrs) -> bytes:
    out = b"".join(_ld(1, i.encode()) for i in inputs)
    out += b"".join(_ld(2, o.encode()) for o in outputs)
    out += _ld(4, op.encode())
    for k, v in attrs.items():
        out += _ld(7, _attr_bytes(k, v))
    return out


def build_model(
    nodes: list[bytes],
    initializers: list[bytes],
    input_name: str,
    output_name: str,
) -> bytes:
    """Minimal valid ModelProto bytes for the parser/executor (and for
    onnxruntime when available — fields follow onnx.proto)."""
    vi_in = _ld(1, input_name.encode())
    vi_out = _ld(1, output_name.encode())
    graph = (
        b"".join(_ld(1, n) for n in nodes)
        + b"".join(_ld(5, t) for t in initializers)
        + _ld(11, vi_in)
        + _ld(12, vi_out)
    )
    # ir_version (1), opset_import (8: OperatorSetIdProto{version=2})
    opset = _vi(2, 13)
    return _vi(1, 8) + _ld(8, opset) + _ld(7, graph)
