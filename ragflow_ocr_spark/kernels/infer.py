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


def get_det_net(model_bytes: bytes | None = None) -> Net:
    """Lazy per-worker detection session (cache key mirrors the
    reference's (model_path, device_id) key, ``ocr/ocr.py:70-77``)."""
    key = "det"
    if key not in _CACHE:
        if model_bytes is not None:
            raise NotImplementedError(
                "onnxruntime unavailable in this sandbox; production path "
                "builds an InferenceSession from broadcast bytes here"
            )
        from ragflow_ocr_spark.kernels.stubnet import DetStubNet

        _CACHE[key] = DetStubNet()
    return _CACHE[key]


def get_rec_net(model_bytes: bytes | None = None) -> Net:
    key = "rec"
    if key not in _CACHE:
        if model_bytes is not None:
            raise NotImplementedError(
                "onnxruntime unavailable in this sandbox; production path "
                "builds an InferenceSession from broadcast bytes here"
            )
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
