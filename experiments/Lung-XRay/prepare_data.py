"""Prepare the Lung X-Ray datasets (montgomery mask merge + resize, NIH resize).

TPU-native equivalent of reference Lung-XRay/prepare_data.py: montgomery
left+right lung mask union resized to 256^2 with an 80/20 train/test split at
prep time, NIH resize, JSRT copytree into the jsrt1/jsrt2 layout.

Two invocation forms:
  * ``prepare_data.py INPUT --data OUT`` — the reference CLI
    (Lung-XRay/prepare_data.py:108-135): INPUT holds the raw distribution
    trees ``data/Montgomery/MontgomerySet``, ``data/NIH``,
    ``jsrt/Segmentation01``, ``jsrt/segmentation02/segmentation``; the
    processed/copied datasets land under OUT.
  * ``prepare_data.py --data ROOT`` — combined layout: ROOT already contains
    ``montgomery/``, ``nih/`` (and jsrt1/jsrt2 in their distributed layout);
    processed trees are written next to them.
"""

import argparse
import os
import sys
from shutil import copytree

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders import prepare_montgomery, prepare_nih


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", nargs="?", default=None,
                        help="Raw distribution root (reference layout); "
                             "omit to use the combined --data layout")
    parser.add_argument("--data", type=str, default="./data/lung/",
                        help="Output root (with INPUT) or combined raw+output "
                             "root (without)")
    args = parser.parse_args()

    if args.input is not None:
        # reference layout (Lung-XRay/prepare_data.py:114-135)
        mont_raw = os.path.join(args.input, "data", "Montgomery", "MontgomerySet")
        nih_raw = os.path.join(args.input, "data", "NIH")
        jsrt1_raw = os.path.join(args.input, "jsrt", "Segmentation01")
        jsrt2_raw = os.path.join(args.input, "jsrt", "segmentation02", "segmentation")
    else:
        mont_raw = os.path.join(args.data, "montgomery")
        nih_raw = os.path.join(args.data, "nih")
        jsrt1_raw = jsrt2_raw = None

    if os.path.exists(mont_raw):
        out = os.path.join(args.data, "montgomery_processed")
        os.makedirs(out, exist_ok=True)
        prepare_montgomery(mont_raw, out)
        print("montgomery prepared")
    if os.path.exists(nih_raw):
        out = os.path.join(args.data, "nih_processed")
        os.makedirs(out, exist_ok=True)
        prepare_nih(nih_raw, out)
        print("nih prepared")
    for src, name in ((jsrt1_raw, "jsrt1"), (jsrt2_raw, "jsrt2")):
        if src and os.path.exists(src):
            dst = os.path.join(args.data, name)
            if not os.path.exists(dst):
                copytree(src, dst)
            print(f"{name} copied")
    if args.input is None:
        print("jsrt1/jsrt2 are used in their distributed layout — nothing to do")


if __name__ == "__main__":
    main()
