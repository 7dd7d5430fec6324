"""Download + build the MitoEM-suite EM volumes (vnc, lucchi, urocell, mitoem).

TPU-native equivalent of reference MitoEM/prepare_data.py: fetches every
archive the suite needs and builds the h5 volumes / TIFF slice exports the
loaders and evaluation runners expect — from an empty data directory
(network permitting). The reference delegates MitoEM + UroCell acquisition
to torch_em (prepare_data.py:48-50, common.py:19-46); here the converters
are part of the framework (pda.data.builders.prepare).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders.em import _get_vnc_data, _require_lucchi_data
from pda.data.builders.prepare import prepare_mitoem_sample, prepare_urocell_slices


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="./data/")
    parser.add_argument(
        "--skip_mitoem", action="store_true",
        help="Skip the MitoEM zips (tens of GB; the source-training volumes)."
    )
    args = parser.parse_args()

    _get_vnc_data(os.path.join(args.data, "vnc"), download=True)
    print("vnc volumes ready")
    _require_lucchi_data(os.path.join(args.data, "lucchi"), download=True)
    print("lucchi volumes ready")
    prepare_urocell_slices(args.data, download=True)
    print("urocell volumes + evaluation slices ready")
    if not args.skip_mitoem:
        for sample in ("human", "rat"):
            prepare_mitoem_sample(
                os.path.join(args.data, "mitoem"), sample, download=True
            )
        print("mitoem volumes ready")


if __name__ == "__main__":
    main()
