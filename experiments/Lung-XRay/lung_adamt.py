"""AdaMT joint source+target training on Lung X-Ray (4x3 cross-domain).

TPU-native equivalent of reference Lung-XRay/lung_adamt.py: joint supervised
source ELBO + teacher-pseudo target ELBO with ramped EMA, 100k iterations.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.experiments import standard_parser
from pda.experiments.lung import da_run

if __name__ == "__main__":
    args = standard_parser(__doc__, extra_flags=("consensus",)).parse_args()
    da_run(args, "adamt")
