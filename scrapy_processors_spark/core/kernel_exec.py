"""Vectorized execution of fused kernel stages.

Implements the reference ``MapCompose`` per-element semantics
(``/root/reference/scrapy_processors/collections.py:132-145``) over *flat*
pandas/NumPy arrays instead of per-row Python loops:

- one flat value vector + one segment-id vector (row ownership),
- scalar stages run once over the whole flat vector (vectorized kernel),
- ``None`` results are dropped (reference ``arg_to_iter(None) == []``),
- list-valued stages (ExtractDigits, Emails, ...) expand via ``np.repeat`` on
  the segment ids — the reference's flattening (collections.py:137),
- regrouping back to per-row lists is a single ``np.split`` since segment ids
  stay non-decreasing throughout.

This is the CIDR-2022 "vectorized Python UDF" execution pattern (PAPERS.md):
the JVM hands us Arrow record batches; everything here is columnar.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import numpy as np
import pandas as pd


def _wrap_stage_error(pipeline_name: str, stage, values, exc: Exception):
    # Mirrors the reference's error provenance (collections.py:138-143).
    sample = list(values[:3]) if values is not None else None
    return ValueError(
        f"Error in {pipeline_name} with {stage} values={sample!r}... "
        f"error='{type(exc).__name__}: {exc}'"
    )


class FlatBatch:
    """Flat value vector + segment ids for a batch of rows."""

    __slots__ = ("values", "seg", "n_rows")

    def __init__(self, values: pd.Series, seg: np.ndarray, n_rows: int):
        self.values = values.reset_index(drop=True)
        self.seg = seg
        self.n_rows = n_rows

    @classmethod
    def from_scalar_series(cls, s: pd.Series) -> "FlatBatch":
        """Each row contributes one value; nulls contribute zero values
        (reference ``arg_to_iter(None) == []``)."""
        n = len(s)
        mask = s.notna().to_numpy()
        seg = np.arange(n, dtype=np.int64)[mask]
        return cls(s[mask], seg, n)

    @classmethod
    def from_list_series(cls, s: pd.Series) -> "FlatBatch":
        """Each row holds a list of values (ArrayType column)."""
        n = len(s)
        lists = [v if isinstance(v, (list, np.ndarray)) else ([] if v is None else [v]) for v in s]
        counts = np.fromiter((len(v) for v in lists), dtype=np.int64, count=n)
        seg = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat: List[Any] = []
        for v in lists:
            flat.extend(v)
        return cls(pd.Series(flat, dtype=object), seg, n)

    def drop_none(self) -> None:
        mask = self.values.notna().to_numpy()
        if not mask.all():
            self.values = self.values[mask].reset_index(drop=True)
            self.seg = self.seg[mask]

    def apply_scalar_stage(self, stage, pipeline_name: str) -> None:
        try:
            self.values = stage.kernel(self.values).reset_index(drop=True)
        except Exception as e:  # noqa: BLE001 - provenance wrapper
            raise _wrap_stage_error(pipeline_name, stage, list(self.values), e) from e
        self.drop_none()

    def apply_list_stage(self, stage, pipeline_name: str) -> None:
        try:
            res = stage.kernel(self.values)
        except Exception as e:  # noqa: BLE001
            raise _wrap_stage_error(pipeline_name, stage, list(self.values), e) from e
        lists = [v if isinstance(v, (list, tuple)) else ([] if v is None else [v]) for v in res]
        counts = np.fromiter((len(v) for v in lists), dtype=np.int64, count=len(lists))
        self.seg = np.repeat(self.seg, counts)
        flat: List[Any] = []
        for v in lists:
            flat.extend(v)
        self.values = pd.Series(flat, dtype=object)
        self.drop_none()

    # ---- output ------------------------------------------------------------
    def to_list_series(self) -> pd.Series:
        counts = np.bincount(self.seg, minlength=self.n_rows)
        splits = np.split(self.values.to_numpy(), np.cumsum(counts)[:-1])
        return pd.Series([list(chunk) for chunk in splits])

    def to_scalar_series(self) -> pd.Series:
        """First value per row, None when a row lost all its values."""
        out = np.full(self.n_rows, None, dtype=object)
        if len(self.seg):
            uniq, first_idx = np.unique(self.seg, return_index=True)
            out[uniq] = self.values.to_numpy()[first_idx]
        return pd.Series(out, dtype=object)


def run_stages(batch: FlatBatch, stages: Sequence, pipeline_name: str = "MapCompose") -> FlatBatch:
    for stage in stages:
        if stage.is_list_valued:
            batch.apply_list_stage(stage, pipeline_name)
        else:
            batch.apply_scalar_stage(stage, pipeline_name)
    return batch
