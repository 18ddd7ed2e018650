"""CSV folder IO shared by all preprocess steps (reference schema)."""

from __future__ import annotations

import csv
import json
import os
import sys
from typing import Dict, Iterable, List, Sequence

csv.field_size_limit(sys.maxsize)


def read_csv_folder(folder: str):
    """-> (header: list, rows: list[list[str]])."""
    header, rows = None, []
    for name in sorted(os.listdir(folder)):
        if not name.endswith(".csv"):
            continue
        with open(os.path.join(folder, name)) as f:
            for i, row in enumerate(csv.reader(f)):
                if i == 0:
                    header = row
                    continue
                rows.append(row)
    return header, rows


def write_csv(path: str, header: Sequence[str],
              rows: Iterable[Sequence]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        for r in rows:
            w.writerow(r)


def build_initial_csv(video_folder: str, out_path: str) -> int:
    """Step 0: initial CSV with video_path/height/width/num_frames
    (reference ``preprocess/dataset_download/csv_prepare_openvid.py``)."""
    from frameino_tpu.data.video_io import decode_video
    rows = []
    for name in sorted(os.listdir(video_folder)):
        if not name.endswith((".mp4", ".avi", ".mkv", ".webm")):
            continue
        v = decode_video(os.path.join(video_folder, name))
        rows.append([name, v.shape[1], v.shape[2], v.shape[0]])
    write_csv(out_path, ["video_path", "height", "width", "num_frames"],
              rows)
    return len(rows)


def row_dict(header: Sequence[str], row: Sequence[str]) -> Dict[str, str]:
    return dict(zip(header, row))
