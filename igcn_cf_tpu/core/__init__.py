from igcn_cf_tpu.core.registry import DATASETS, MODELS, TRAINERS, Registry  # noqa: F401
