from tpu_vo.models import refinement

__all__ = ["refinement"]
