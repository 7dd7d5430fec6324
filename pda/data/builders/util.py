"""Download/unzip plumbing for the dataset builders.

Equivalent of torch_em ``data.datasets.util.{download_source, unzip}``
(reference call sites my_vnc.py:11, my_lucchi.py:10). Downloads are
checksum-verified; in an offline environment the builders raise a clear
error pointing at the expected local layout instead.
"""

from __future__ import annotations

import hashlib
import os
import zipfile


def download_source(path: str, url: str, download: bool, checksum: str | None = None):
    if os.path.exists(path):
        return path
    if not download:
        raise RuntimeError(
            f"Dataset file {path} is missing and download=False. "
            f"Place the file there manually (source: {url})."
        )
    import urllib.request

    try:
        print(f"Downloading {url} -> {path}")
        urllib.request.urlretrieve(url, path)
    except Exception as e:  # zero-egress environments land here
        raise RuntimeError(
            f"Could not download {url} ({e}). If this machine has no network "
            f"access, download the file elsewhere and place it at {path}."
        ) from e

    if checksum is not None:
        sha = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                sha.update(chunk)
        digest = sha.hexdigest()
        if digest != checksum:
            raise RuntimeError(
                f"Checksum mismatch for {path}: expected {checksum}, got {digest}"
            )
    return path


def unzip(zip_path: str, dst: str, remove: bool = True):
    with zipfile.ZipFile(zip_path, "r") as f:
        f.extractall(dst)
    if remove:
        os.remove(zip_path)
