"""Experiment trackers: wandb when available, JSONL always.

Parity with the reference's tracker glue (`diffnext/utils/accelerate_utils.py:
48-57` wandb with run-id resume; the pc fork's swanlab-as-wandb,
`train_newloss.py:17`): a tracker is just a callable ``(metrics, step)``
handed to the Trainer.
"""

import json
import os
import time
from typing import Callable, Dict, Optional

from nova_pointcloud_tpu.utils.config import flatten_config


class JsonlTracker:
    """Append metrics to <output_dir>/metrics.jsonl (always works)."""

    def __init__(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")

    def __call__(self, metrics: Dict[str, float], step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, "time": time.time(),
                                **metrics}) + "\n")


def build_tracker(output_dir: str, project: Optional[str] = None,
                  name: Optional[str] = None, config: Optional[Dict] = None,
                  resume_id: Optional[str] = None) -> Callable:
    """wandb tracker if importable + configured, else JSONL; both chained."""
    jsonl = JsonlTracker(output_dir)
    try:
        import wandb  # noqa: F401

        run = wandb.init(project=project or "nova_tpu", name=name,
                         id=resume_id, resume="allow" if resume_id else None,
                         config=flatten_config(config or {}), dir=output_dir)

        def tracker(metrics, step):
            jsonl(metrics, step)
            run.log(metrics, step=step)

        return tracker
    except Exception:
        return jsonl
