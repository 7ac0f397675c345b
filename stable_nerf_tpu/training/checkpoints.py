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


def frozen_partition_checksum(params: Any, mask: Any) -> Dict[str, float]:
    """Cheap per-subtree checksum of the FROZEN partition (ADVICE r3 #3).

    Trainable-only restore trusts that re-running the deterministic init +
    pretrained overlay reproduces the frozen partition; this sum catches a
    silently different reconstruction (JAX version bump, backend change,
    wrong overlay).  Sum of |x| per top-level ``sd`` subtree — positive
    terms, so no cancellation hides a divergence; compared with rtol at
    restore (cross-backend reduction order shifts the low bits).
    """
    import jax
    import jax.numpy as jnp

    from ..utils.pytree import partition

    _, frozen = partition(params, mask)

    @jax.jit
    def sums(frozen):
        out = {}
        for key, sub in frozen.get("sd", {}).items():
            leaves = [x for x in jax.tree.leaves(sub)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.floating)]
            if leaves:
                out[key] = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                               for x in leaves)
        return out

    return {k: float(v) for k, v in sums(frozen).items()}


def verify_frozen_checksum(recorded: Optional[Dict[str, float]],
                           rebuilt: Dict[str, float], *, rtol: float = 1e-3,
                           log_fn=print) -> None:
    """Compare a FORMAT.json-recorded frozen checksum against the rebuilt
    partition's.  > rtol relative error on any subtree → ValueError (the
    restored trainables would sit on a different frozen model); any
    nonzero drift below that → warning (benign reduction-order skew)."""
    if not recorded:
        return
    bad, drift = {}, {}
    for k, want in recorded.items():
        got = rebuilt.get(k)
        if got is None:
            bad[k] = (want, None)
            continue
        denom = max(abs(want), 1e-30)
        rel = abs(got - want) / denom
        if rel > rtol:
            bad[k] = (want, got)
        elif rel > 0:
            drift[k] = rel
    if bad:
        raise ValueError(
            "frozen-partition checksum mismatch after reconstruction — the "
            "rebuilt frozen model is NOT the one this checkpoint was "
            f"trained against (recorded vs rebuilt): {bad}")
    if drift:
        log_fn(f"checkpoints: frozen checksum drift within tolerance "
               f"(max rel {max(drift.values()):.2e}) — expected across "
               f"backend/XLA-version changes")

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
        self._sweep_stale_tmp()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def _sweep_stale_tmp(self):
        """Remove leftover ``*.orbax-checkpoint-tmp*`` step dirs.

        A process dying mid-async-save (the round-3 demos left three of
        these) strands an incomplete tmp dir that is never restorable and
        — depending on the orbax version — can shadow the step number it
        was writing.  They are garbage by definition; sweep them at
        startup (VERDICT r3 next #2).  Single-host-safe: only process 0
        of a multi-host job constructs before a barrier in practice, and
        removing a tmp dir another live process is writing is prevented
        by the manager-level wait_until_finished discipline within one
        process; across processes the sweep only runs at startup, before
        any save is dispatched."""
        import glob
        import shutil

        for p in glob.glob(os.path.join(self.directory,
                                        "*.orbax-checkpoint-tmp*")):
            shutil.rmtree(p, ignore_errors=True)

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

    # fmt keys that record the frozen-partition reconstruction INPUTS: any
    # divergence between a run and the on-disk sidecar makes every v2 step
    # this run would write unrestorable-correctly (ADVICE r3 #2) — refuse
    # at save time, not only at resume.  "frozen_checksum" is derived (a
    # float, tolerance-compared at restore) and excluded from equality.
    RECONSTRUCTION_KEYS = ("version", "trainable_only", "seed",
                           "pretrained_sd", "frozen_dtype",
                           "trainable_scope", "sdxl_fingerprint")

    def write_format(self, fmt: Dict):
        """Persist the checkpoint-format sidecar (single writer: call from
        process 0 only on multi-host — save() callers already are).

        An existing sidecar is authoritative for the steps already on
        disk: this run's fmt must agree on every reconstruction-input key
        the sidecar records, or writing more v2 steps under it would mix
        two incompatible frozen models in one directory (ADVICE r3 #2 —
        previously a fresh non-resume run silently did exactly that)."""
        path = os.path.join(self.directory, FORMAT_FILE)
        if os.path.exists(path):
            with open(path) as f:
                on_disk = json.load(f)
            conflicts = {
                k: (on_disk[k], fmt.get(k))
                for k in self.RECONSTRUCTION_KEYS
                if k in on_disk and k in fmt and on_disk[k] != fmt[k]
            }
            if conflicts:
                raise ValueError(
                    f"refusing to write checkpoints under {self.directory}: "
                    f"its FORMAT.json records frozen-reconstruction inputs "
                    f"that differ from this run's — {conflicts} (on-disk vs "
                    f"this run).  Use a fresh --workdir, or rerun with the "
                    f"recorded inputs.")
            return
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
