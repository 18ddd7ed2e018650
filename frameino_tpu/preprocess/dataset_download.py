"""Step 0: OpenVid-1M download + initial CSV preparation.

Reference ``preprocess/dataset_download/openvid_download.py`` (wget the
HF zip parts, unzip flat into a video folder, multi-part fallback for
oversized parts) and ``csv_prepare_openvid.py`` (join the OpenVid
master CSV with the files actually present, shard into N sub-CSVs with
columns ``ID, video_path, provided_text`` for parallel downstream
workers).
"""

from __future__ import annotations

import csv
import os
import urllib.request
import zipfile
from typing import List, Optional, Sequence

OPENVID_URL = ("https://huggingface.co/datasets/nkp37/OpenVid-1M/"
               "resolve/main/OpenVid_part{i}.zip")
OPENVID_PART_URL = ("https://huggingface.co/datasets/nkp37/OpenVid-1M/"
                    "resolve/main/OpenVid_part{i}_part{j}.zip")
MAX_PART = 186


def download_openvid(output_directory: str, start_zip_idx: int,
                     end_zip_idx: int, url_opener=None) -> List[str]:
    """Download + flat-extract OpenVid zip parts [start, end).

    ``url_opener(url, dst_path)`` is injectable for testing; the default
    streams via urllib. Failed parts retry the reference's two-chunk
    split URLs; failures are logged to ``download/download_log.txt``
    and skipped (the reference continues the same way).
    """
    zip_folder = os.path.join(output_directory, "download")
    video_folder = os.path.join(output_directory, "videos")
    os.makedirs(zip_folder, exist_ok=True)
    os.makedirs(video_folder, exist_ok=True)
    log_path = os.path.join(zip_folder, "download_log.txt")

    def fetch(url, dst):
        if url_opener is not None:
            return url_opener(url, dst)
        with urllib.request.urlopen(url) as r, open(dst, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)

    def flat_extract(zip_path):
        with zipfile.ZipFile(zip_path) as z:
            for name in z.namelist():
                if name.endswith("/"):
                    continue
                base = os.path.basename(name)
                with z.open(name) as src, \
                        open(os.path.join(video_folder, base), "wb") as dst:
                    dst.write(src.read())

    done = []
    for i in range(start_zip_idx, min(end_zip_idx, MAX_PART)):
        zp = os.path.join(zip_folder, f"OpenVid_part{i}.zip")
        try:
            fetch(OPENVID_URL.format(i=i), zp)
            flat_extract(zp)
            done.append(zp)
        except Exception as e:  # noqa: BLE001 - log and continue
            # the primary zip may exist partially on disk; it was never
            # fully downloaded, so drop it and record the real chunk paths
            if os.path.exists(zp):
                os.remove(zp)
            try:
                # oversized parts ship split in two (reference fallback)
                for j in range(2):
                    pp = os.path.join(zip_folder,
                                      f"OpenVid_part{i}_part{j}.zip")
                    fetch(OPENVID_PART_URL.format(i=i, j=j), pp)
                    flat_extract(pp)
                    done.append(pp)
            except Exception as e2:  # noqa: BLE001
                with open(log_path, "a") as f:
                    f.write(f"part {i} failed: {e}; fallback: {e2}\n")
    return done


def prepare_openvid_csv(master_csv_path: str, video_parent_path: str,
                        store_csv_folder: str, division_num: int = 1,
                        video_column: str = "video",
                        caption_column: str = "caption") -> int:
    """Join the OpenVid master CSV with present files -> sharded
    ``ID, video_path, provided_text`` sub-CSVs (reference
    ``csv_prepare_openvid.py``). Returns the number of valid rows."""
    rows = []
    with open(master_csv_path) as f:
        reader = csv.reader(f)
        col = {}
        for idx, row in enumerate(reader):
            if idx == 0:
                col = {k: j for j, k in enumerate(row)}
                continue
            name = row[col[video_column]]
            path = os.path.join(video_parent_path, name)
            if not os.path.exists(path):
                continue
            rows.append([len(rows), path, row[col[caption_column]]])

    os.makedirs(store_csv_folder, exist_ok=True)
    n = len(rows)
    for d in range(division_num):
        sub = rows[n * d // division_num: n * (d + 1) // division_num]
        with open(os.path.join(store_csv_folder, f"sub{d}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["ID", "video_path", "provided_text"])
            w.writerows(sub)
    return n
