"""Mean-Teacher PUNet self-training on LIVECell (8x7 cross-cell-type).

TPU-native equivalent of reference LIVECell/livecell_mt.py: separate
self-training with weak augs on both views (512^2 patches bs=2, 10k iters),
student+teacher warm-started from the source checkpoint, EMA 0.999; the
teacher MC-16 pseudo-labels + consensus + EMA update run inside the jitted
train step. Predictions use the teacher parameters.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.experiments import standard_parser
from pda.experiments.livecell_da import run

if __name__ == "__main__":
    parser = standard_parser(__doc__, extra_flags=("consensus",))
    args = parser.parse_args()
    args.data = args.data if args.data != "./data/" else "./data/livecell/"
    run(args, "mean-teacher")
