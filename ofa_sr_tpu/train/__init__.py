from .schedules import calc_learning_rate, warmup_learning_rate, lr_at_step
from .optim import TorchOpt, make_optimizer, no_decay_mask
from .touched import cls_touched_mask, sr_touched_mask
from .train_step import SRTrainer
from .run_manager import RunConfig, SRRunManager
from .checkpoint import (
    import_torch_s4,
    import_torch_x4,
    load_checkpoint,
    save_checkpoint,
)
from .bn_recalib import bn_recalibrate
from .shrink import supporting_elastic, validate_grid
from .tiled_infer import receptive_field_radius, tiled_sr_infer

__all__ = [
    "calc_learning_rate",
    "warmup_learning_rate",
    "lr_at_step",
    "TorchOpt",
    "make_optimizer",
    "no_decay_mask",
    "cls_touched_mask",
    "sr_touched_mask",
    "SRTrainer",
    "RunConfig",
    "SRRunManager",
    "import_torch_s4",
    "import_torch_x4",
    "load_checkpoint",
    "save_checkpoint",
    "bn_recalibrate",
    "supporting_elastic",
    "validate_grid",
    "receptive_field_radius",
    "tiled_sr_infer",
]
