"""Solve-state checkpoint/resume (SURVEY §5.4).

The reference has no checkpointing — solves are short and the state is just
(x, r). This makes that stance concrete: an npz round-trip of the solve
state plus enough metadata to resume a tolerance loop exactly where it
stopped (warm-started solves accept x0)."""

from __future__ import annotations

import numpy as np


def save_solve_state(path: str, x, b, *, iters=0, history=None, meta=None):
    """Persist a solve's resumable state. `x`/`b` are device or host arrays;
    history is the nan-padded relative residual history."""
    np.savez(
        path,
        x=np.asarray(x),
        b=np.asarray(b),
        iters=int(iters),
        history=(
            np.asarray(history) if history is not None else np.zeros(0)
        ),
        meta=np.array(repr(meta or {}), dtype=object),
    )


def load_solve_state(path: str) -> dict:
    """Load a checkpoint. Returns {x, b, iters, history, meta}; feed x back
    as x0 to resume (the tolerance loop is stateless beyond x)."""
    import ast

    with np.load(path, allow_pickle=True) as z:
        return {
            "x": z["x"],
            "b": z["b"],
            "iters": int(z["iters"]),
            "history": z["history"],
            "meta": ast.literal_eval(str(z["meta"])),
        }
