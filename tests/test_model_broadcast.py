"""Broadcast model-bytes path (M1/S5): driver broadcasts serialized
model bytes; each worker builds + caches ONE session keyed by content
hash; results are identical to the default in-process model."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from ragflow_ocr_spark.kernels.infer import STUB_MAGIC, get_det_net


def _stub_bytes(kx: int = 41) -> bytes:
    return STUB_MAGIC + json.dumps({"kind": "det", "kx": kx}).encode()


def test_session_singleton_by_content():
    a = get_det_net(_stub_bytes())
    b = get_det_net(_stub_bytes())
    assert a is b  # same bytes -> same cached session
    c = get_det_net(_stub_bytes(kx=21))
    assert c is not a  # different weights -> different session
    assert c.kx == 21


def test_unknown_format_routes_to_onnx_parser():
    # non-STUBNET/NPZLOGITS bytes go down the ONNX route: garbage is a
    # parse error (ValueError); a VALID model with unsupported ops is
    # the op-granular NotImplementedError seam (tests/test_onnx_np.py)
    with pytest.raises((ValueError, NotImplementedError)):
        get_det_net(b"\x08\x01protobufish")


def test_broadcast_reaches_workers_and_matches_default(spark):
    """Round trip: broadcast bytes -> worker-local session -> same
    detection output as the default net on a rendered page."""
    import numpy as np

    from ragflow_ocr_spark.kernels import font5x7, pngcodec

    bc = spark.sparkContext.broadcast(_stub_bytes())
    img, _ = font5x7.render_page(["BROADCAST PATH OK"], 480, 96, 2)
    png = pngcodec.encode_png(img)

    def stage(batches):
        from ragflow_ocr_spark.kernels.infer import get_det_net as gdn
        from ragflow_ocr_spark.kernels.ocr_pipeline import extract_payload

        net = gdn(bc.value)
        again = gdn(bc.value)
        ok_singleton = net is again and net.kx == 41
        for b in batches:
            r = extract_payload(png)
            yield pd.DataFrame(
                {
                    "n": [len(b)],
                    "singleton": [ok_singleton],
                    "text": [r.text],
                }
            )

    rows = (
        spark.range(0, 32, 1, 4)
        .mapInPandas(stage, "n int, singleton boolean, text string")
        .collect()
    )
    assert all(r["singleton"] for r in rows)
    texts = {r["text"] for r in rows}
    assert texts == {"BROADCAST PATH OK"}
