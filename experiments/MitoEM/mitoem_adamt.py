"""AdaMT joint training: MitoEM source + {vnc, lucchi, urocell} targets.

TPU-native equivalent of reference MitoEM/mitoem_adamt.py (joint supervised
source ELBO + teacher-pseudo target ELBO, ramped EMA, 10k iterations).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

import common

from pda.experiments import standard_parser
from pda.experiments.mitoem_da import run

if __name__ == "__main__":
    args = standard_parser(__doc__, extra_flags=("consensus", "type")).parse_args()
    run(args, "adamt", common)
