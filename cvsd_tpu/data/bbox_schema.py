"""Tabular BBox schema + CSV emitter/reader — bit-compatible with the reference.

Capability parity with the reference's tabular layer:
- BBox dataclass schema (clip:int, name:str, frame:int, person:float track id,
  left/top/width/height:float normalized xywh, is_anomaly:bool, anomaly:str)
  (/root/reference/dataset.py:46-61)
- appending rows via dataclass-csv's DataclassWriter(skip_header=True) — i.e.
  headerless append (/root/reference/model.py:79-81)
- CSV -> DataFrame loading with a pickle cache (/root/reference/dataset.py:8-43)

Value formatting matches dataclass_csv/csv.writer: floats via repr, bools as
'True'/'False', so a file produced here is byte-equivalent to the reference's
for the same detections.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterable, List, Optional

BBOX_COLUMNS = ("clip", "name", "frame", "person", "left", "top", "width", "height", "is_anomaly", "anomaly")


@dataclass
class BBox:
    """One tracked person detection in one frame (reference: dataset.py:46-61)."""

    clip: int
    name: str
    frame: int
    person: float  # track id
    left: float    # normalized cx (ultralytics xywhn[0])
    top: float     # normalized cy
    width: float   # normalized w
    height: float  # normalized h
    is_anomaly: bool
    anomaly: str


def append_bboxes(path: str, rows: Iterable[BBox], write_header: bool = False) -> int:
    """Headerless append, one row per BBox (reference: model.py:79-81)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    n = 0
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if write_header:
            w.writerow(BBOX_COLUMNS)
        for r in rows:
            w.writerow([r.clip, r.name, r.frame, r.person, r.left, r.top,
                        r.width, r.height, r.is_anomaly, r.anomaly])
            n += 1
    return n


def read_bboxes(path: str, has_header: bool = False) -> List[BBox]:
    out: List[BBox] = []
    with open(path, newline="") as f:
        reader = csv.reader(f)
        for i, row in enumerate(reader):
            if has_header and i == 0:
                continue
            if not row:
                continue
            out.append(
                BBox(
                    clip=int(row[0]), name=row[1], frame=int(row[2]), person=float(row[3]),
                    left=float(row[4]), top=float(row[5]), width=float(row[6]), height=float(row[7]),
                    is_anomaly=row[8] == "True", anomaly=row[9],
                )
            )
    return out


def load_bbox_dataframe(csv_path: str, cache_dir: Optional[str] = "./cache/"):
    """CSV -> pandas DataFrame with pickle cache
    (reference: dataset.py:26-39 — fixed: that version lacked `self` and headers)."""
    import pandas as pd

    if cache_dir:
        cache_path = os.path.join(cache_dir, f"{os.path.basename(csv_path)}.pkl")
        if os.path.exists(cache_path):
            return pd.read_pickle(cache_path)
    df = pd.read_csv(csv_path, names=list(BBOX_COLUMNS), header=None)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        df.to_pickle(cache_path)
    return df
