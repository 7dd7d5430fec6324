"""AdaMT joint source+target Mean-Teacher training on LIVECell.

TPU-native equivalent of reference LIVECell/livecell_adamt.py: per step one
supervised source ELBO + one teacher-pseudo target ELBO (averaged), ramped
EMA min(1-1/(t+1), 0.999), 256^2 patches, 100k iterations. Predictions use
the teacher parameters (reference :166).
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
    run(args, "adamt")
