"""cvsd_tpu — TPU-native shoplifting-detection framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
``cthadeufaria/computer-vision-shoplifting-detection`` (see SURVEY.md):

- Pipeline A: UCF-Crime video -> batched person detection on TPU -> tabular
  bbox CSV in the reference's exact schema (reference: preprocess.py,
  model.py, dataset.py) + an XceptionTime-style time-series classifier.
- Pipeline B: PoseLift pose sequences -> Shopformer anomaly detector
  (ST-GCN graph-conv autoencoder tokenizer + transformer token
  reconstructor), two-stage training, eval, inference, sweeps
  (reference: shopformer/ and shopformer_2/).

Everything on the compute path is pure JAX (jit/pjit/shard_map + Pallas
kernels for the hot ops); the host runtime (video decode, ring buffers,
CSV emission) is C++-backed where it matters.
"""

__version__ = "0.1.0"

from cvsd_tpu.config import Config, load_config, merge_configs, validate_config  # noqa: F401
