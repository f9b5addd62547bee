from igcn_cf_tpu.train.trainer import BasicTrainer, get_trainer  # noqa: F401
from igcn_cf_tpu.train import bpr  # noqa: F401
from igcn_cf_tpu.train import bce, ml  # noqa: F401
