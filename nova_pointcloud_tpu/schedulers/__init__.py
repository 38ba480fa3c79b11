from nova_pointcloud_tpu.schedulers.ddpm import DDPMScheduler  # noqa: F401
from nova_pointcloud_tpu.schedulers.flow_match import FlowMatchEulerScheduler  # noqa: F401
from nova_pointcloud_tpu.schedulers.builder import build_scheduler  # noqa: F401
