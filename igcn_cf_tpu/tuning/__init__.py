from igcn_cf_tpu.tuning.grid import GRIDS, grid_search, tune_preset  # noqa: F401
