from .interp import masked_interp, masked_interp_fill, masked_interp_linear

__all__ = ["masked_interp", "masked_interp_fill", "masked_interp_linear"]
