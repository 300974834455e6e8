from .registry import (AUTO_ENCODER, DATASETS, DIFFUSION, DISTRIBUTION,
                       EMBEDDER, EMBEDMANAGER, ENGINE, INFER_ENGINE, MODEL,
                       PRETRAIN, VISUAL, Registry, build_from_config)
from .config import (AttrDict, Config, apply_cli_overrides, assign_single_cfg,
                     assign_signle_cfg, load_yaml_with_bases, merge_dicts)
from .defaults import default_cfg, merge_update
from .logging import get_logger, log_json_stats, setup_logging
from .seed import rank_seed, setup_seed
