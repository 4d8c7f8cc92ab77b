from . import descriptive, mart, predictive, prescriptive, segmentation

__all__ = ["descriptive", "mart", "predictive", "prescriptive", "segmentation"]
