from nova_pointcloud_tpu.models.diffusion_mlp import DiffusionMLP  # noqa: F401
from nova_pointcloud_tpu.models.diffusion_transformer import DiffusionTransformer  # noqa: F401
from nova_pointcloud_tpu.models.guidance import GuidanceConfig  # noqa: F401
from nova_pointcloud_tpu.models.nova import NOVATransformer  # noqa: F401
from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer  # noqa: F401
from nova_pointcloud_tpu.models.pointcloud_ar import NOVAPointCloudARTransformer  # noqa: F401
from nova_pointcloud_tpu.models.vit import VisionTransformer  # noqa: F401
