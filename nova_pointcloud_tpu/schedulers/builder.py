"""Scheduler construction from declarative configs.

Parity with `diffnext/pipelines/builder.py:78-100`: a scheduler config may
carry ``_noise_class_name`` / ``_sample_class_name`` selecting different
scheduler classes for training noise vs. inference sampling.
"""

from typing import Dict

from nova_pointcloud_tpu.schedulers.ddpm import DDPMScheduler
from nova_pointcloud_tpu.schedulers.flow_match import FlowMatchEulerScheduler

_CLASSES = {
    "DDPMScheduler": DDPMScheduler,
    "FlowMatchEulerScheduler": FlowMatchEulerScheduler,
    "FlowMatchEulerDiscreteScheduler": FlowMatchEulerScheduler,  # reference alias
}


def build_scheduler(config: Dict, phase: str = "sample"):
    """Build a scheduler. ``phase`` is "noise" (training) or "sample"."""
    config = dict(config or {})
    name = config.pop(f"_{phase}_class_name", None) or config.pop("class_name", None) \
        or config.pop("_class_name", "FlowMatchEulerScheduler")
    config = {k: v for k, v in config.items() if not k.startswith("_")}
    cls = _CLASSES.get(name)
    if cls is None:
        raise KeyError(f"Unknown scheduler class {name!r}. Known: {sorted(_CLASSES)}")
    import inspect

    accepted = set(inspect.signature(cls).parameters)
    return cls(**{k: v for k, v in config.items() if k in accepted})
