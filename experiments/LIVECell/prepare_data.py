"""Download LIVECell data + build segmentation label TIFFs.

TPU-native equivalent of reference LIVECell/prepare_data.py: downloads
images.zip + COCO jsons and rasterizes the train/test annotations.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders.livecell import (
    _annotation_file,
    _download_images,
    _image_and_label_paths,
)


def download_livecell_data(path):
    _download_images(path, download=True)
    for split in ("train", "test"):
        _annotation_file(path, split, download=True)
        _image_and_label_paths(path, split, download=True, cell_types=None)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="./data/livecell/")
    args = parser.parse_args()
    download_livecell_data(args.data)


if __name__ == "__main__":
    main()
