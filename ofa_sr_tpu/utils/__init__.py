from .common import (
    AverageMeter,
    get_same_padding,
    int2list,
    make_divisible,
    sub_filter_start_end,
    val2list,
)
from .metrics import (
    psnr_np,
    psnr_y_device,
    quantize_img,
    rgb2y_device,
    rgb2y_np,
    tensor2img_np,
)

__all__ = [
    "AverageMeter",
    "get_same_padding",
    "int2list",
    "make_divisible",
    "sub_filter_start_end",
    "val2list",
    "psnr_np",
    "psnr_y_device",
    "quantize_img",
    "rgb2y_device",
    "rgb2y_np",
    "tensor2img_np",
]
