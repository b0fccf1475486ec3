"""dvc_tpu — TPU-native dense video captioning framework (PDVC family).

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
trtuananh/Dense-Video-Captioning: PDVC set-prediction dense captioning
(deformable transformer encoder/decoder + event counter + LSTM caption
heads), end-to-end TSP/MViTv2 video backbone, HuBERT audio fusion, and
the densevid_eval3 evaluation stack (METEOR/CIDEr/BLEU/SODA).

Layout:
  ops/       1-D multi-scale deformable attention (Pallas kernel + jnp oracle),
             on-device linear assignment solver
  models/    PDVC model core (flax), matcher, criterion, caption heads,
             postprocessing, fusion model
  data/      feature datasets, vocabulary/translator, static-shape collation
  parallel/  device mesh + sharding helpers (pjit data parallelism)
  train/     training loop, optimizer, LR schedules, checkpointing
  eval/      dense-video-captioning metrics (2018/2021 protocols, SODA,
             paragraph captioning) and the evaluation driver
  utils/     config system (argparse+YAML with base_cfg_path inheritance),
             logging, box ops
"""

__version__ = "0.1.0"
