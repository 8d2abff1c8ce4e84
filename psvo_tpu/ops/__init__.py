from psvo_tpu.ops import resampling

__all__ = ["resampling"]
