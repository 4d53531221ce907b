"""Input pipeline (L5): decode/augment/normalize + samplers.

Replaces the reference's torchvision/timm data layer (resnet/train.py:249-282,
deit/datasets.py, deit/samplers.py) with a host-side loader (PIL or native
C++ JPEG decode) feeding device-side jitted augmentation.
"""

from mrla_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize,
    eval_transform_params,
    center_crop_resize,
    random_resized_crop_params,
    mixup_cutmix,
    random_erasing,
)
from mrla_tpu.data.samplers import distributed_indices, ra_sampler_indices
from mrla_tpu.data.imagefolder import ImageFolder, iterate_batches
from mrla_tpu.data.synthetic import synthetic_batches

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "normalize",
    "eval_transform_params",
    "center_crop_resize",
    "random_resized_crop_params",
    "mixup_cutmix",
    "random_erasing",
    "distributed_indices",
    "ra_sampler_indices",
    "ImageFolder",
    "iterate_batches",
    "synthetic_batches",
]
