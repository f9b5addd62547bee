from igcn_cf_tpu.data.dataset import Interactions, get_dataset  # noqa: F401
from igcn_cf_tpu.data import loaders  # noqa: F401  (registers dataset loaders)
from igcn_cf_tpu.data.sampler import (  # noqa: F401
    DeviceNegativeSampler,
    sample_bpr_epoch,
)
from igcn_cf_tpu.data.transforms import (  # noqa: F401
    auxiliary_interactions,
    dropit,
    dropui,
)
