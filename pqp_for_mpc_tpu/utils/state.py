"""Solver-state checkpointing.

The reference has no checkpoint/resume (SURVEY.md §5) — its domain analog
is warm starting, which :class:`pqp_for_mpc_tpu.models.MPCController`
does in memory.  These helpers persist that state (the dual iterate and
bookkeeping) to an ``.npz`` so a receding-horizon process can stop and
resume, or ship multipliers between machines.
"""

from __future__ import annotations

import numpy as np


def save_state(path: str, Y, iters=None, meta: dict | None = None) -> None:
    """Persist a dual iterate (and optional per-instance iteration counts
    / metadata scalars) to ``path`` (.npz)."""
    arrays = {"Y": np.asarray(Y)}
    if iters is not None:
        arrays["iters"] = np.asarray(iters)
    for k, v in (meta or {}).items():
        arrays[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_state(path: str):
    """Load ``(Y, iters, meta)`` saved by :func:`save_state`; ``iters``
    is None if absent."""
    with np.load(path) as z:
        Y = z["Y"]
        iters = z["iters"] if "iters" in z.files else None
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    return Y, iters, meta
