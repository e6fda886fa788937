"""Pallas TPU kernels (interpreter-backed off-TPU for tests)."""

from fmdm_tpu.ops.pallas.flash_attention import flash_attention

__all__ = ["flash_attention"]
