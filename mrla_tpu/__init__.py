"""mrla_tpu — TPU-native (JAX/Flax/Pallas) framework reproducing MRLA-Net.

Reference capability map: joyfang1106/MRLA ("Cross-Layer Retrospective
Retrieving via Layer Attention", ICLR 2023).  See SURVEY.md for the layer map
this package implements TPU-first (NHWC layout, bf16 compute, GSPMD sharding).
"""

__version__ = "0.1.0"

from mrla_tpu.models import registry  # noqa: F401  (populates the model registry)

__all__ = ["registry", "__version__"]
