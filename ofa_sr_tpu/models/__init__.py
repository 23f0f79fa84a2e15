from .arch import SearchSpace, SubnetConfig, sample_subnet, subnet_seed
from .net_config import (
    build_from_config,
    get_active_net_config,
    load_net_config,
    specialize,
)
from .ofa_cls import ClsArch, OFAMobileNetV3, OFAProxylessNASNets
from .ofa_s4 import OFAMobileNetS4
from .ofa_x4 import OFAMobileNetX4

__all__ = [
    "SearchSpace",
    "SubnetConfig",
    "sample_subnet",
    "subnet_seed",
    "OFAMobileNetS4",
    "OFAMobileNetX4",
    "ClsArch",
    "OFAMobileNetV3",
    "OFAProxylessNASNets",
    "build_from_config",
    "get_active_net_config",
    "load_net_config",
    "specialize",
]
