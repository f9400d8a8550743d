from .attention import dot_product_attention, make_causal_bias, mask_to_bias

__all__ = ["dot_product_attention", "make_causal_bias", "mask_to_bias"]
