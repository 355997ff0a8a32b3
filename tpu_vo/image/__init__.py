from tpu_vo.image import color, filters, pyramid

__all__ = ["color", "filters", "pyramid"]
