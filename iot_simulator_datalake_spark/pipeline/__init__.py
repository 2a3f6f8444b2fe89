"""The ported medallion pipeline (bronze → silver → gold)."""

from .iot_models import build_registry, attach_reference_checks

__all__ = ["build_registry", "attach_reference_checks"]
