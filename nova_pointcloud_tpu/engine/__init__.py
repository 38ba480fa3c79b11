from nova_pointcloud_tpu.engine.ema import EMAState, ema_init, ema_update  # noqa: F401
from nova_pointcloud_tpu.engine.lr_schedules import (  # noqa: F401
    constant_lr,
    cosine_lr,
    multistep_lr,
)
from nova_pointcloud_tpu.engine.optim import build_optimizer  # noqa: F401
from nova_pointcloud_tpu.engine.trainer import Trainer  # noqa: F401
