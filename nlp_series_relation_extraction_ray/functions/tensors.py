"""Tensor-boundary utilities (numpy analogs of the reference's torch ops).

These live at the edge between Arrow batches (ragged ``list<int32>``
columns) and the dense tensors a scorer consumes — padding happens HERE,
once per batch, never as dataset columns (SURVEY §2.2 M6/M7).
"""

from __future__ import annotations

import numpy as np


def sequence_padding(
    inputs: list, length: int | None = None, padding=0, dtype=None
) -> np.ndarray:
    """Pad/truncate ragged sequences to one dense array.

    Parity: ``/root/reference/dataset/data_utils.py:173-187`` — pad with
    ``padding`` up to the batch max (or ``length``), truncate longer rows.
    ``padding`` may be a scalar or an array (per-timestep fill for
    multi-dim labels, as the reference uses ``np.zeros((R, 2))``).
    """
    if length is None:
        length = max((len(x) for x in inputs), default=0)
    out = []
    pad_unit = np.asarray(padding)
    for x in inputs:
        x = np.asarray(x)
        if len(x) < length:
            fill = np.broadcast_to(
                pad_unit, (length - len(x),) + x.shape[1:]
            )
            x = np.concatenate([x, fill]) if len(x) else fill.copy()
        else:
            x = x[:length]
        out.append(x)
    arr = np.stack(out) if out else np.zeros((0, length))
    return arr.astype(dtype) if dtype is not None else arr


def batch_gather(data: np.ndarray, index: np.ndarray) -> np.ndarray:
    """Per-row gather: ``out[i] = data[i, index[i], :]``.

    Parity: ``/root/reference/dataset/data_utils.py:189-197`` (the
    subject-span hidden-state gather in the MPN cascade), vectorized
    instead of the reference's Python loop.
    """
    index = np.asarray(index)
    return data[np.arange(data.shape[0]), index]
