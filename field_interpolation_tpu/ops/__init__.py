from .pallas_stencil import fits_vmem, fused_normal_apply

__all__ = ["fits_vmem", "fused_normal_apply"]
