from .mbconv import fused_mbconv_infer, mbconv_reference

__all__ = ["fused_mbconv_infer", "mbconv_reference"]
