from .transforms import (
    CenterCrop,
    Compose,
    EntropyCrop,
    ModCrop,
    NineRandomCrop,
    RandomCrop,
    RandomHorizontalFlip,
    RandomRotation,
    Scale,
    bicubic_downscale_pil,
    to_numpy,
)
from .datasets import PairedImageDataset, SRImageDataset, SyntheticSRDataset
from .providers import (
    CodecDecoderProvider,
    DataProvider,
    Div2KSetXXProvider,
    OracleVideoProvider,
    SyntheticSRProvider,
)

__all__ = [
    "CenterCrop", "Compose", "EntropyCrop", "ModCrop", "NineRandomCrop",
    "RandomCrop", "RandomHorizontalFlip", "RandomRotation", "Scale",
    "bicubic_downscale_pil", "to_numpy",
    "PairedImageDataset", "SRImageDataset", "SyntheticSRDataset",
    "CodecDecoderProvider", "DataProvider", "Div2KSetXXProvider",
    "OracleVideoProvider", "SyntheticSRProvider",
]
