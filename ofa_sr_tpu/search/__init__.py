from .encoder import encode_cls_arch, encode_sr_subnet
from .accuracy_predictor import AccuracyPredictor
from .flops import (
    count_params,
    s4_subnet_flops,
    s4_subnet_params,
    cls_subnet_flops,
    FLOPsTable,
)
from .latency import (
    LatencyTable,
    build_block_latency_table,
    build_latency_table,
    lut_efficiency_fn,
    measure_latency,
    measure_latency_device,
)
from .evolution import EvolutionFinder

__all__ = [
    "encode_cls_arch", "encode_sr_subnet",
    "AccuracyPredictor",
    "count_params", "s4_subnet_flops", "s4_subnet_params",
    "cls_subnet_flops", "FLOPsTable",
    "LatencyTable", "measure_latency", "measure_latency_device",
    "build_latency_table", "build_block_latency_table", "lut_efficiency_fn",
    "EvolutionFinder",
]
