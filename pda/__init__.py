"""pda — TPU-native probabilistic domain adaptation for biomedical image segmentation.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
computational-cell-analytics/Probabilistic-Domain-Adaptation (see /root/reference):
unsupervised domain adaptation for 2D binary segmentation via self-training with a
Probabilistic U-Net (PUNet), Monte-Carlo pseudo-labels and consensus masking.

Layer map (mirrors SURVEY.md section 7):
  pda.core        pure jittable math: ELBO, KL, consensus, dice, EMA, init
  pda.models      flax.linen models: UNet2d, PUNet (NHWC, bf16-friendly)
  pda.kernels     Pallas TPU kernels for the fused hot ops
  pda.parallel    device mesh + sharding helpers (data-parallel over ICI)
  pda.data        numpy/grain data pipelines, dataset builders, augmentations
  pda.train       train-step functions per algorithm + training engine + ckpt
  pda.infer       on-device tiled (halo) MC inference, pseudo-label export
  pda.eval        dice evaluation runners
  pda.experiments experiment CLIs (LIVECell / MitoEM / Lung X-Ray)
"""

__version__ = "0.1.0"
