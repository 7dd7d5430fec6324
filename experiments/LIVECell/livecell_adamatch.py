"""AdaMatch joint source+target training on LIVECell (no teacher).

TPU-native equivalent of reference LIVECell/livecell_adamatch.py: joint
supervised + self-pseudo-label training with weak/strong views
(blur .6-3 / noise .05-.25 / contrast .33-3, p=0.5), 256^2 patches,
100k iterations. Predictions use the model parameters.
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
    run(args, "adamatch")
