from psvo_tpu.parallel import context, sharding

__all__ = ["context", "sharding"]
