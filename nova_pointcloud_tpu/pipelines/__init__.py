"""Public pipeline exports.

Unlike the reference (`diffnext/pipelines/__init__.py:18` exports only
NOVAPipeline while the README imports a nonexistent NOVAPointCloudPipeline),
every pipeline is importable from here.
"""

from nova_pointcloud_tpu.pipelines.builder import build_pipeline  # noqa: F401
from nova_pointcloud_tpu.pipelines.pretrained import from_pretrained  # noqa: F401
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline, NOVAPipelineOutput  # noqa: F401
from nova_pointcloud_tpu.pipelines.nova_c2i import NOVAC2IPipeline  # noqa: F401
from nova_pointcloud_tpu.pipelines.pointcloud_ar import NOVAPointCloudARPipeline  # noqa: F401
from nova_pointcloud_tpu.pipelines.pointcloud_gen import (  # noqa: F401
    NOVAPointCloudGenerationPipeline,
    NOVAPointCloudPipelineOutput,
)
from nova_pointcloud_tpu.pipelines.pointcloud_train import (  # noqa: F401
    NOVATrainPointCloudPipeline,
)
from nova_pointcloud_tpu.pipelines.train_nova import (  # noqa: F401
    NOVATrainC2IPipeline,
    NOVATrainT2IPipeline,
    NOVATrainT2VPipeline,
    PIPELINES,
)

# alias matching the reference README's intended name (`README.md:100`)
NOVAPointCloudPipeline = NOVAPointCloudGenerationPipeline
