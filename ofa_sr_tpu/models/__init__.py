from .arch import SearchSpace, SubnetConfig, sample_subnet, subnet_seed
from .ofa_s4 import OFAMobileNetS4
from .ofa_x4 import OFAMobileNetX4

__all__ = [
    "SearchSpace",
    "SubnetConfig",
    "sample_subnet",
    "subnet_seed",
    "OFAMobileNetS4",
    "OFAMobileNetX4",
]
