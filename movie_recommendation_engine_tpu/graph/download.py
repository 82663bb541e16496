"""MovieLens dataset downloader + integrity verification.

Counterpart of reference ``download_dataset.py:19-153``: streams the ML-25M
archive with progress, extracts, and verifies the four CSVs. Network access is
gated — in offline environments it reports clearly and points at the
synthetic data source instead of failing obscurely.
"""

from __future__ import annotations

import os
import zipfile

ML_25M_URL = "https://files.grouplens.org/datasets/movielens/ml-25m.zip"
ML_100K_URL = "https://files.grouplens.org/datasets/movielens/ml-100k.zip"
REQUIRED_CSVS = ("movies.csv", "ratings.csv", "tags.csv", "links.csv")


def verify_dataset(data_dir: str) -> bool:
    """All four CSVs present (download_dataset.py:75-105)?"""
    return all(os.path.exists(os.path.join(data_dir, f)) for f in REQUIRED_CSVS)


def download_file(url: str, dest: str, chunk_size: int = 1 << 20) -> bool:
    """Streamed download with progress. Returns False (with a message) when
    the environment has no network egress."""
    try:
        import urllib.request

        os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
        with urllib.request.urlopen(url, timeout=30) as resp:
            total = int(resp.headers.get("Content-Length", 0))
            done = 0
            with open(dest, "wb") as f:
                while True:
                    chunk = resp.read(chunk_size)
                    if not chunk:
                        break
                    f.write(chunk)
                    done += len(chunk)
                    if total:
                        print(f"\r  {done / 1e6:.1f}/{total / 1e6:.1f} MB", end="")
            print()
        return True
    except Exception as e:  # noqa: BLE001 — surface any network failure
        print(f"download failed ({type(e).__name__}: {e}). "
              "If this environment has no network access, use "
              "--data.source synthetic instead.")
        return False


def extract_zip(zip_path: str, dest_dir: str) -> None:
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(dest_dir)


def download_ml25m(data_dir: str) -> bool:
    """Full flow: download + extract + verify (download_dataset.py:107-153)."""
    if verify_dataset(data_dir):
        print(f"dataset already present at {data_dir}")
        return True
    parent = os.path.dirname(os.path.abspath(data_dir)) or "."
    zip_path = os.path.join(parent, "ml-25m.zip")
    if not os.path.exists(zip_path):
        print(f"downloading {ML_25M_URL} ...")
        if not download_file(ML_25M_URL, zip_path):
            return False
    print("extracting ...")
    extract_zip(zip_path, parent)
    ok = verify_dataset(data_dir)
    print("verification:", "OK" if ok else "MISSING FILES")
    return ok
