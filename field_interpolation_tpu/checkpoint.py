"""Checkpoint / resume for long solves (SURVEY.md §5 "Checkpoint / resume").

The reference's only resume story is the GUI keeping the previous frame's
solution in RAM as a warm start; the rebuild keeps that (CG ``x0``) and adds
explicit save/restore of solver state for long sharded solves: a `.npz` of the
current iterate plus grid/weights metadata. Restart = load + pass as ``x0``
(CG restart from the last iterate is mathematically a plain warm start)."""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from .grid import Grid
from .weights import Weights


def save_state(path: str, x, grid: Grid, weights: Weights, **extra) -> None:
    """Persist a solver iterate (or final field) with problem metadata."""
    meta = dict(grid_shape=list(grid.shape),
                weights=dataclasses.asdict(weights), **extra)
    np.savez(path, x=np.asarray(x), meta=json.dumps(meta))


def load_state(path: str):
    """Returns (x, grid, weights, extra)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    grid = Grid(tuple(meta.pop("grid_shape")))
    weights = Weights(**meta.pop("weights"))
    return data["x"], grid, weights, meta
