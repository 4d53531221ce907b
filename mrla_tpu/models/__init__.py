"""Model zoo (L1) and registry (L2)."""

from mrla_tpu.models.registry import register_model, create_model, list_models

__all__ = ["register_model", "create_model", "list_models"]
