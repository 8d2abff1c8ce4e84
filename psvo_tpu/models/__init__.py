from psvo_tpu.models import dynamics
from psvo_tpu.models.ssm import SSM, init_ssm

__all__ = ["SSM", "dynamics", "init_ssm"]
