"""Model zoo (L1) and registry (L2).

Importing this package registers every architecture name (the reference
discovers arch names via models.__dict__ reflection, resnet/train.py:24-26;
we do the same via import-time @register_model decorators).
"""

from mrla_tpu.models.registry import register_model, create_model, list_models

from mrla_tpu.models import resnet  # noqa: F401, E402
from mrla_tpu.models import resnet_mrla_light  # noqa: F401, E402
from mrla_tpu.models import resnet_mrla_base  # noqa: F401, E402
from mrla_tpu.models import resnet_la_eq4  # noqa: F401, E402
from mrla_tpu.models import deit  # noqa: F401, E402
from mrla_tpu.models import deit_mrla  # noqa: F401, E402
from mrla_tpu.models import efficientnet_mrla  # noqa: F401, E402
from mrla_tpu.models import resmlp  # noqa: F401, E402
from mrla_tpu.models import patchconvnet  # noqa: F401, E402

__all__ = ["register_model", "create_model", "list_models"]
