"""Model session factory — executor-side lazy singleton.

Mirrors the reference's process-global ``loaded_models`` cache
(``/root/reference/ocr/ocr.py:34, 69-145``): one session per model per
Python worker process, built on first use and reused across Arrow
batches/tasks. On a cluster the model *bytes* arrive via
``sc.broadcast`` and are fed to onnxruntime here; in this sandbox the
deterministic stub networks stand in behind the same ``run()`` surface
(see ``stubnet.py``).

Session options parity (for the real-model path, documented, not built
here because onnxruntime is absent): disable CPU memory arena,
sequential execution, intra/inter threads = ``spark.task.cpus``
(reference uses 2/2, ``ocr/ocr.py:115-119``) to avoid oversubscription
across concurrent Spark tasks.
"""

from __future__ import annotations

from typing import Protocol

import numpy as np


class Net(Protocol):
    def run(self, x: np.ndarray) -> np.ndarray: ...


# NOTE for the real-model path: det_preprocess returns a strided CHW
# view; an onnxruntime session requires contiguous input, so the
# session wrapper must call np.ascontiguousarray(x) here. The stub
# nets read strided arrays natively.


_CACHE: dict[str, Net] = {}

# Serialized stub-model format: b"STUBNET1" + JSON params. This makes
# the broadcast model-bytes path REAL end-to-end (driver broadcasts
# bytes → worker builds + caches a session keyed by content) while
# onnxruntime is absent; an ONNX protobuf payload hits the documented
# seam below instead.
STUB_MAGIC = b"STUBNET1"


def _session_from_bytes(kind: str, model_bytes: bytes) -> Net:
    if model_bytes.startswith(STUB_MAGIC):
        import json

        params = json.loads(model_bytes[len(STUB_MAGIC) :].decode("utf-8"))
        from ragflow_ocr_spark.kernels.stubnet import DetStubNet, RecStubNet

        if kind == "det":
            return DetStubNet(kx=params.get("kx", 41))
        return RecStubNet()
    raise NotImplementedError(
        "onnxruntime unavailable in this sandbox; production path builds "
        "an InferenceSession from these broadcast bytes here (contiguous "
        "input + arena/thread options per the module docstring)"
    )


def _cache_key(kind: str, model_bytes: bytes | None) -> str:
    if model_bytes is None:
        return kind
    import hashlib

    return f"{kind}:{hashlib.md5(model_bytes).hexdigest()}"


def get_det_net(model_bytes: bytes | None = None) -> Net:
    """Lazy per-worker detection session (cache key mirrors the
    reference's (model_path, device_id) key, ``ocr/ocr.py:70-77`` —
    here (kind, content-hash of the broadcast bytes))."""
    key = _cache_key("det", model_bytes)
    if key not in _CACHE:
        if model_bytes is not None:
            _CACHE[key] = _session_from_bytes("det", model_bytes)
        else:
            from ragflow_ocr_spark.kernels.stubnet import DetStubNet

            _CACHE[key] = DetStubNet()
    return _CACHE[key]


def get_rec_net(model_bytes: bytes | None = None) -> Net:
    key = _cache_key("rec", model_bytes)
    if key not in _CACHE:
        if model_bytes is not None:
            _CACHE[key] = _session_from_bytes("rec", model_bytes)
        else:
            from ragflow_ocr_spark.kernels.stubnet import RecStubNet

            _CACHE[key] = RecStubNet()
    return _CACHE[key]


def run_with_retry(net: Net, x: np.ndarray, attempts: int = 4) -> np.ndarray:
    """Inference retry loop — reference retries ≤4 times with a sleep on
    transient failures (``/root/reference/ocr/ocr.py:343-350``). The
    sleep is omitted for the in-process stub (nothing transient exists);
    the production session path restores it."""
    last: Exception | None = None
    for _ in range(attempts):
        try:
            return net.run(x)
        except Exception as e:  # pragma: no cover - stub never raises
            last = e
    raise RuntimeError(f"inference failed after {attempts} attempts") from last
