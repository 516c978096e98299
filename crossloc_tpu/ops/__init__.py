"""Custom TPU kernels (Pallas)."""
from .pallas_groupnorm import groupnorm_relu, set_pallas_enabled

__all__ = ["groupnorm_relu", "set_pallas_enabled"]
