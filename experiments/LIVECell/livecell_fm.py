"""FixMatch PUNet self-training on LIVECell (8x7 cross-cell-type).

TPU-native equivalent of reference LIVECell/livecell_fm.py: the same model
generates MC-16 pseudo-labels on the weak view and trains on the strong view
(blur 1-4 / noise .1-.35 / contrast .33-3, p=0.9), with optional
distribution alignment computed from the exported source pseudo-labels
(run livecell_punet_target.py --get_pseudo_labels first). 10k iterations.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.experiments import standard_parser
from pda.experiments.livecell_da import run

if __name__ == "__main__":
    parser = standard_parser(__doc__, extra_flags=("consensus",))
    parser.add_argument(
        "--no_distribution_alignment", dest="distribution_alignment",
        action="store_false", default=True,
    )
    args = parser.parse_args()
    args.data = args.data if args.data != "./data/" else "./data/livecell/"
    run(args, "fixmatch")
