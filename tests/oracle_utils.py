"""Canonical comparison of a Spark result vs a DuckDB oracle result.

Mirrors the driver's check: identical column-name sets, identical row
counts, and order-insensitive value equality. Values are canonicalized to
strings (floats via shortest-roundtrip ``repr`` — the probes are engineered
so doubles match bit-for-bit, no tolerance needed)."""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd


def canon_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return canon_value(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(canon_value(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s_rows, d_rows = canon_rows(spark_pdf), canon_rows(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
