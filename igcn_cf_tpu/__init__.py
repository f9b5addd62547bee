"""igcn_cf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) inductive embedding/retrieval engine.

Brand-new framework with the capabilities of the INMO reference implementation
(WuYunfan/igcn_cf, SIGIR'22): the full collaborative-filtering model zoo (MF,
LightGCN, IGCN/INMO, IMF, NGCF, IMCGAE, IDCF-LGCN, MultiVAE, NeuMF, ItemKNN,
Popularity), BPR/BCE/VAE training, masked full-catalog top-k retrieval with
Precision/Recall/NDCG@k, and the transductive / dropit / dropui inductive
evaluation protocols — re-designed TPU-first:

  * functional models over explicit parameter pytrees, jitted train steps
  * graph propagation as static-shape sparse matmuls (XLA segment-sum path +
    Pallas blocked kernels) instead of DGL gspmm (reference model.py:102)
  * device-side negative sampling instead of 6 DataLoader worker processes
    (reference trainer.py:226-227, dataset.py:119-131)
  * row-sharded embedding tables over a jax.sharding.Mesh with XLA collectives
    for multi-chip scale (new capability — the reference is single-GPU,
    SURVEY.md §2.2)
"""

__version__ = "0.1.0"

from igcn_cf_tpu.core.registry import DATASETS, MODELS, TRAINERS  # noqa: F401
