"""Real-model session path (VERDICT round-1 item 1): ONNX bytes build
an onnxruntime session with the reference's exact options
(``/root/reference/ocr/ocr.py:115-141``), and recorded-logits replay
fixtures drive the full postprocess chain through
``_session_from_bytes`` with non-STUBNET bytes."""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

from ragflow_ocr_spark.config import OCRConfig
from ragflow_ocr_spark.kernels import infer
from ragflow_ocr_spark.kernels.ocr_pipeline import ocr_image

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _fixture_bytes(name: str) -> bytes:
    with open(os.path.join(GOLDENS, name), "rb") as f:
        return f.read()


# --------------------------------------------------------------- replay
def test_replay_fixture_end_to_end_golden():
    """Committed recorded-logits fixtures route the pipeline through
    ReplayNet sessions and reproduce the page byte-exactly."""
    from tools.gen_replay_fixture import EXPECTED_TEXT, render_fixture_page

    det_b = _fixture_bytes("replay_det.npzb")
    rec_b = _fixture_bytes("replay_rec.npzb")
    assert not det_b.startswith(infer.STUB_MAGIC)  # non-STUBNET bytes
    img, _ = render_fixture_page()
    cfg = OCRConfig(det_model=det_b, rec_model=rec_b)
    r = ocr_image(img, cfg)
    assert r.status == "ok"
    assert r.text == EXPECTED_TEXT
    # and the sessions actually in use are replay sessions
    assert isinstance(infer.get_det_net(det_b), infer.ReplayNet)
    assert isinstance(infer.get_rec_net(rec_b), infer.ReplayNet)


def test_replay_net_round_trip_and_miss():
    x = np.arange(12, dtype=np.float32).reshape(1, 3, 2, 2)
    y = np.full((1, 1, 2, 2), 0.5, dtype=np.float32)
    net = infer.ReplayNet(infer.record_replay_bytes([(x, y)])[len(infer.REPLAY_MAGIC):])
    assert np.array_equal(net.run(x), y)
    with pytest.raises(RuntimeError, match="no recorded logits"):
        net.run(x + 1.0)


def test_recording_net_produces_replayable_bytes():
    class Doubler:
        def run(self, x):
            return x * 2

    tap = infer.RecordingNet(Doubler())
    x = np.ones((2, 3), dtype=np.float32)
    tap.run(x)
    blob = tap.replay_bytes()
    assert blob.startswith(infer.REPLAY_MAGIC)
    replay = infer._session_from_bytes("det", blob)
    assert isinstance(replay, infer.ReplayNet)
    assert np.array_equal(replay.run(x), x * 2)


# ----------------------------------------------------------------- ort
class _FakeOrt(types.ModuleType):
    """Minimal onnxruntime facade pinning the option calls the real
    path must make (reference parity ocr.py:115-141)."""

    class ExecutionMode:
        ORT_SEQUENTIAL = "seq"
        ORT_PARALLEL = "par"

    class SessionOptions:
        def __init__(self):
            self.enable_cpu_mem_arena = True
            self.execution_mode = None
            self.intra_op_num_threads = 0
            self.inter_op_num_threads = 0

    class RunOptions:
        def __init__(self):
            self.entries = {}

        def add_run_config_entry(self, k, v):
            self.entries[k] = v

    class _Input:
        name = "x"

    class InferenceSession:
        def __init__(self, model_bytes, sess_options=None, providers=None):
            assert isinstance(model_bytes, (bytes, bytearray))
            self.opts = sess_options
            self.providers = providers
            self.calls = []

        def get_inputs(self):
            return [_FakeOrt._Input()]

        def run(self, outs, feed, run_options):
            x = feed["x"]
            assert x.flags["C_CONTIGUOUS"] and x.dtype == np.float32
            self.calls.append((x.shape, run_options))
            return [x + 1.0]


@pytest.fixture
def fake_ort(monkeypatch):
    mod = _FakeOrt("onnxruntime")
    monkeypatch.setitem(sys.modules, "onnxruntime", mod)
    yield mod


def test_ortnet_builds_session_with_reference_options(fake_ort):
    net = infer.OrtNet(b"\x08\x07fake-onnx-protobuf")
    sess = net._sess
    assert sess.opts.enable_cpu_mem_arena is False
    assert sess.opts.execution_mode == _FakeOrt.ExecutionMode.ORT_SEQUENTIAL
    assert (sess.opts.intra_op_num_threads, sess.opts.inter_op_num_threads) == (2, 2)
    assert sess.providers == ["CPUExecutionProvider"]
    assert net._run_options.entries == {"memory.enable_memory_arena_shrinkage": "cpu"}
    assert net.retry_sleep_s == 5.0
    # strided non-float32 input is made contiguous float32 before run
    x = np.arange(24, dtype=np.float64).reshape(2, 3, 4).transpose(2, 1, 0)
    out = net.run(x)
    assert np.allclose(out, np.ascontiguousarray(x) + 1.0)


def test_onnx_bytes_route_to_ortnet_via_session_factory(fake_ort):
    net = infer._session_from_bytes("det", b"\x08\x07fake-onnx-protobuf")
    assert isinstance(net, infer.OrtNet)


def test_onnx_bytes_without_runtime_fall_back_to_numpy_executor(monkeypatch):
    monkeypatch.setitem(sys.modules, "onnxruntime", None)  # force ImportError
    # garbage protobuf: numpy-executor fallback surfaces a parse error
    with pytest.raises(ValueError):
        infer._session_from_bytes("det", b"\x08\x07fake-onnx-protobuf")
    # a VALID model within the executor's op subset builds and runs
    from ragflow_ocr_spark.kernels import onnx_np as ox

    model = ox.build_model(
        [ox.node_bytes("Relu", ["x"], ["y"])], [], "x", "y"
    )
    net = infer._session_from_bytes("det", model)
    x = np.array([[-1.0, 2.0]], dtype=np.float32)
    assert np.array_equal(net.run(x), np.array([[0.0, 2.0]], dtype=np.float32))
    # a valid model OUTSIDE the subset is the op-granular seam
    bad = ox.build_model([ox.node_bytes("GRU", ["x"], ["y"])], [], "x", "y")
    with pytest.raises(NotImplementedError, match="GRU"):
        infer._session_from_bytes("det", bad)


def test_run_with_retry_sleeps_between_attempts(monkeypatch):
    sleeps: list[float] = []
    monkeypatch.setattr(infer.time, "sleep", lambda s: sleeps.append(s))

    class Flaky:
        retry_sleep_s = 5.0

        def __init__(self):
            self.n = 0

        def run(self, x):
            self.n += 1
            if self.n < 3:
                raise OSError("transient")
            return x

    x = np.zeros(1, dtype=np.float32)
    assert np.array_equal(infer.run_with_retry(Flaky(), x), x)
    assert sleeps == [5.0, 5.0]  # reference backoff (ocr.py:349)

    class Dead:
        def run(self, x):
            raise OSError("always")

    with pytest.raises(RuntimeError, match="after 4 attempts"):
        infer.run_with_retry(Dead(), x)
    assert sleeps == [5.0, 5.0]  # stub/replay nets never sleep


# ------------------------------------------------------------ broadcast
def test_get_net_accepts_broadcast_like_handle():
    class FakeBroadcast:
        def __init__(self, value):
            self.value = value

    det_b = _fixture_bytes("replay_det.npzb")
    direct = infer.get_det_net(det_b)
    via_bc = infer.get_det_net(FakeBroadcast(det_b))
    assert direct is via_bc  # same content hash -> same cached session
    with pytest.raises(TypeError, match="bytes"):
        infer.get_det_net(FakeBroadcast(123))
