"""Calibration data pipeline.

Reference behavior being reproduced (gptqmodel/models/base.py:801-812,
utils/calibration.py): accept raw text / pre-tokenized ids, optional
concatenation to fixed-size rows, length sort, batching with pad masks, and
minimum-size warnings (256 rows / 256 avg tokens).

TPU-specific design: every batch is padded to ONE global static shape so the
capture/Hessian step compiles once and is reused across all batches and all
layers (XLA retraces on shape change; ragged batches would recompile per
batch).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

log = logging.getLogger("gptqmodel_tpu")

MIN_CALIBRATION_ROWS = 256
MIN_CALIBRATION_AVG_TOKENS = 256


@dataclass
class CalibrationBatches:
    input_ids: np.ndarray  # [n_batches, B, T] int32 (0-padded)
    row_mask: np.ndarray  # [n_batches, B, T] f32 (1 = real token)

    @property
    def n_batches(self) -> int:
        return self.input_ids.shape[0]

    @property
    def total_tokens(self) -> int:
        return int(self.row_mask.sum())


def prepare_calibration(
    data,
    tokenizer=None,
    batch_size: int = 4,
    max_length: int = 2048,
    concat_size: int | None = None,
    sort: str | None = "desc",
    pad_token_id: int = 0,
) -> CalibrationBatches:
    """Normalize calibration input into fixed-shape batches + masks.

    ``data``: list of strings (needs tokenizer), list of 1-D int sequences,
    or a 2-D int array. ``concat_size``: join-and-split all sequences into
    uniform rows of this length (reference calibration_concat_size).
    ``sort``: 'desc'|'asc'|None — length sort to reduce padding waste
    (reference calibration_sort).
    """
    rows = _to_token_rows(data, tokenizer, max_length)

    if concat_size:
        flat = np.concatenate(rows)
        n = len(flat) // concat_size
        rows = [flat[i * concat_size : (i + 1) * concat_size] for i in range(n)]

    if len(rows) < MIN_CALIBRATION_ROWS:
        log.warning(
            "calibration has %d rows; reference recommends >= %d for stable "
            "Hessians", len(rows), MIN_CALIBRATION_ROWS,
        )
    avg = sum(len(r) for r in rows) / max(len(rows), 1)
    if avg < MIN_CALIBRATION_AVG_TOKENS:
        log.warning(
            "calibration rows average %.0f tokens; reference recommends >= %d",
            avg, MIN_CALIBRATION_AVG_TOKENS,
        )

    if sort == "desc":
        rows.sort(key=len, reverse=True)
    elif sort == "asc":
        rows.sort(key=len)

    T = min(max(len(r) for r in rows), max_length)
    n_batches = (len(rows) + batch_size - 1) // batch_size
    ids = np.full((n_batches, batch_size, T), pad_token_id, dtype=np.int32)
    mask = np.zeros((n_batches, batch_size, T), dtype=np.float32)
    for i, row in enumerate(rows):
        b, j = divmod(i, batch_size)
        L = min(len(row), T)
        ids[b, j, :L] = row[:L]
        mask[b, j, :L] = 1.0
    return CalibrationBatches(input_ids=ids, row_mask=mask)


def _to_token_rows(data, tokenizer, max_length: int) -> list[np.ndarray]:
    rows: list[np.ndarray] = []
    if isinstance(data, np.ndarray) and data.ndim == 2:
        return [np.asarray(r, dtype=np.int32) for r in data]
    for item in data:
        if isinstance(item, str):
            if tokenizer is None:
                raise ValueError("string calibration data requires a tokenizer")
            enc = tokenizer(item, truncation=True, max_length=max_length)
            rows.append(np.asarray(enc["input_ids"], dtype=np.int32))
        elif isinstance(item, dict) and "input_ids" in item:
            ids = np.asarray(item["input_ids"], dtype=np.int32)
            rows.append(ids.reshape(-1))
        else:
            rows.append(np.asarray(item, dtype=np.int32).reshape(-1))
    return rows
