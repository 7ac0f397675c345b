"""Periodic orbax checkpointing: params + optimizer + occupancy grid + step.

The reference only pickles whole model objects once at the very end of
training (train.py:303-308) — no optimizer state, no resume.  Rebuild
upgrade (SURVEY.md §5): periodic, resumable checkpoints carrying the full
training state, including the occupancy grid (which the reference captures
only implicitly via registered buffers, renderer.py:32-45).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

# FORMAT.json sidecar (written next to the step dirs) — how the state dict
# is keyed.  Absent = version-1 full-state checkpoints ({"params": ...}).
# Version 2 ("trainable_only": true) stores the trainable partition under
# "trainable" — a distinct key, so a v2 checkpoint can never be silently
# restored through a v1 full-params template (orbax would fail the tree
# match loudly instead of leaving the frozen partition at random init).
FORMAT_FILE = "FORMAT.json"


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any, grid_state: Any,
             extra: Optional[Dict] = None, wait: bool = False,
             params_key: str = "params", fmt: Optional[Dict] = None):
        state = {
            params_key: params,
            "opt_state": opt_state,
            "grid_state": grid_state,
            "extra": extra or {},
        }
        if fmt:
            self.write_format(fmt)
        # serialize with any still-streaming previous async save: a SIGTERM
        # can land while a periodic save is in flight, and the preemption
        # arm then issues a fresh save — overlapping async saves are
        # an error in orbax
        self.manager.wait_until_finished()
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def write_format(self, fmt: Dict):
        """Persist the checkpoint-format sidecar (single writer: call from
        process 0 only on multi-host — save() callers already are)."""
        path = os.path.join(self.directory, FORMAT_FILE)
        if not os.path.exists(path):
            with open(path, "w") as f:
                json.dump(fmt, f, indent=1)

    def read_format(self) -> Dict:
        """The FORMAT.json sidecar, or {} for version-1 checkpoints."""
        path = os.path.join(self.directory, FORMAT_FILE)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def restore(self, step: Optional[int] = None, template: Optional[Any] = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait_until_finished(self):
        """Block until every dispatched async save has committed.

        MUST be called before process exit if any save() ran with
        wait=False: orbax streams asynchronously, and interpreter
        shutdown mid-write raises ('cannot schedule new futures after
        shutdown') and leaves only a corrupt .orbax-checkpoint-tmp — a
        clean-looking exit with NO durable checkpoint (observed live on
        the round-3 SIGTERM demo when a periodic epoch save raced the
        preemption exit)."""
        self.manager.wait_until_finished()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
