from nova_pointcloud_tpu.utils.registry import Registry  # noqa: F401
from nova_pointcloud_tpu.utils.logging import SmoothedValue, Timer, get_logger, get_progress  # noqa: F401
