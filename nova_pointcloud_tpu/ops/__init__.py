from nova_pointcloud_tpu.ops import masking, pointops, losses  # noqa: F401
