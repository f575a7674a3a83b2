"""Large-scale training-data operators (beyond the reference surface)."""
