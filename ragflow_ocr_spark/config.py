"""Pipeline configuration.

Mirrors the semantics of the reference's flat config dict
(``/root/reference/ocr/config.py:20-41``) as a frozen dataclass; the
``eval``-able scale string of the reference's NormalizeImage
(``/root/reference/ocr/operators.py:118``) is deliberately replaced by a
plain float. Values are env-overridable like the reference's
``OCR_*`` env handling (``config.py:22``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any


def _env_float(name: str, default: float) -> float:
    v = os.environ.get(name)
    return float(v) if v is not None else default


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v is not None else default


@dataclass(frozen=True)
class OCRConfig:
    """Thresholds/shapes of the detect→recognize path.

    Field-by-field parity with reference ``DEFAULT_CONFIG``
    (``ocr/config.py:20-41``).
    """

    # detection preprocess (ocr/config.py:32-33, operators.py:208-255)
    det_limit_side_len: int = 960
    det_limit_type: str = "max"
    # DB postprocess (ocr/config.py:34-36, postprocess.py:55-67)
    det_db_thresh: float = 0.3
    det_db_box_thresh: float = 0.5
    det_db_unclip_ratio: float = 1.5
    max_candidates: int = 1000
    min_size: int = 3
    # DBPostProcess mode switches (ocr/ocr.py:272-273, postprocess.py:52-64)
    det_box_type: str = "quad"        # 'quad' | 'poly'
    det_score_mode: str = "fast"      # 'fast' | 'slow'
    # recognition (ocr/config.py:39-40, ocr/ocr.py:150-151) —
    # rec_image_shape is [3, 48, 320]; the width seeds each
    # micro-batch's max_wh_ratio at 320/48 (ocr/ocr.py:211)
    rec_image_height: int = 48
    rec_image_width: int = 320
    rec_batch_num: int = 16
    # final line filter (ocr/config.py:31, ocr/ocr.py:566-571)
    drop_score: float = 0.5
    # model routing (ocr/ocr.py:69-145 load_model): serialized model
    # payload per stage — raw bytes or a pyspark Broadcast of bytes
    # (resolved worker-side; see kernels/infer.py). None → default
    # in-process stub nets. Formats: ONNX protobuf (real ort session),
    # NPZLOGITS1 (recorded-logits replay), STUBNET1 (stub params).
    det_model: Any = None
    rec_model: Any = None

    @staticmethod
    def from_env() -> "OCRConfig":
        return OCRConfig(
            det_limit_side_len=_env_int("OCR_DET_LIMIT_SIDE_LEN", 960),
            det_db_thresh=_env_float("OCR_DET_DB_THRESH", 0.3),
            det_db_box_thresh=_env_float("OCR_DET_DB_BOX_THRESH", 0.5),
            det_db_unclip_ratio=_env_float("OCR_DET_DB_UNCLIP_RATIO", 1.5),
            drop_score=_env_float("OCR_DROP_SCORE", 0.5),
            rec_batch_num=_env_int("OCR_REC_BATCH_NUM", 16),
        )


@dataclass(frozen=True)
class HtmlConfig:
    """Readability-style block scoring knobs (ours — SURVEY.md §2.11)."""

    min_block_score: float = 10.0     # density threshold τ
    min_text_len: int = 10            # blocks shorter than this never win alone
    link_density_max: float = 0.5     # blocks above this are boilerplate
    neighbor_bonus: float = 0.3       # smoothing weight from adjacent blocks


@dataclass(frozen=True)
class PipelineConfig:
    ocr: OCRConfig = field(default_factory=OCRConfig)
    html: HtmlConfig = field(default_factory=HtmlConfig)
    # scale plumbing (SURVEY.md §4)
    target_partitions: int = 0        # 0 → leave to AQE / input splits
    # payloads above this are range-spread one-per-partition and
    # scheduled first (spread_for_extract). 16 KB ≈ 4× the corpus
    # median page: catches the ~100× skew rows while leaving ordinary
    # pages on the cheap hash path. Tune per corpus at deploy time.
    salt_heavy_bytes: int = 1 << 14


DEFAULT = PipelineConfig()
