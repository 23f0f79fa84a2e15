from .encoder import encode_cls_arch, encode_sr_subnet
from .accuracy_predictor import AccuracyPredictor
from .flops import (
    count_params,
    s4_subnet_flops,
    s4_subnet_params,
    cls_subnet_flops,
    FLOPsTable,
)
from .latency import LatencyTable, measure_latency
from .evolution import EvolutionFinder

__all__ = [
    "encode_cls_arch", "encode_sr_subnet",
    "AccuracyPredictor",
    "count_params", "s4_subnet_flops", "s4_subnet_params",
    "cls_subnet_flops", "FLOPsTable",
    "LatencyTable", "measure_latency",
    "EvolutionFinder",
]
