"""Download + build the MitoEM-suite EM volumes (vnc, lucchi, urocell, mitoem).

TPU-native equivalent of reference MitoEM/prepare_data.py: fetches the zips
and builds the h5 volumes the loaders expect.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders.em import _get_vnc_data, _require_lucchi_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="./data/")
    args = parser.parse_args()

    _get_vnc_data(os.path.join(args.data, "vnc"), download=True)
    _require_lucchi_data(os.path.join(args.data, "lucchi"), download=True)
    print(
        "vnc + lucchi volumes ready. MitoEM and UroCell volumes must be "
        "fetched from their upstream hosts (see pda/data/builders/em.py for "
        "URLs and the expected h5 layout)."
    )


if __name__ == "__main__":
    main()
