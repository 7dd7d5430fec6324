"""Prepare the Lung X-Ray datasets (montgomery mask merge + resize, NIH resize).

TPU-native equivalent of reference Lung-XRay/prepare_data.py: montgomery
left+right lung mask union resized to 256^2 with an 80/20 train/test split at
prep time, NIH resize, JSRT passthrough (already in the expected layout).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders import prepare_montgomery, prepare_nih


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="./data/lung/",
                        help="Root with raw montgomery/ nih/ jsrt1/ jsrt2/ trees")
    args = parser.parse_args()

    mont_raw = os.path.join(args.data, "montgomery")
    if os.path.exists(mont_raw):
        prepare_montgomery(mont_raw, os.path.join(args.data, "montgomery_processed"))
        print("montgomery prepared")
    nih_raw = os.path.join(args.data, "nih")
    if os.path.exists(nih_raw):
        prepare_nih(nih_raw, os.path.join(args.data, "nih_processed"))
        print("nih prepared")
    print("jsrt1/jsrt2 are used in their distributed layout — nothing to do")


if __name__ == "__main__":
    main()
