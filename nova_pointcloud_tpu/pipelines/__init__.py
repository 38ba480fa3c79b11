from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline  # noqa: F401
