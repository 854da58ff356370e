"""Checkpoint / resume for fitting state.

The reference has no checkpointing (only ad-hoc pickles from the viewer,
reference: deodr/examples/mesh_viewer.py:476-490). Long-running fits on
accelerators should be resumable, so the fitters' optimizer state (a flat
dict of numpy arrays) can be saved/loaded atomically here.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict

import numpy as np

_FITTER_STATE_KEYS = [
    "vertices",
    "speed_vertices",
    "transform_quaternion",
    "speed_quaternion",
    "transform_translation",
    "speed_translation",
    "mesh_color",
    "speed_mesh_color",
    "light_directional",
    "speed_light_directional",
    "light_ambient",
    "speed_light_ambient",
    "iter",
]


def save_fitter(fitter, path: str) -> None:
    """Atomically save a fitter's optimizer state to an .npz file."""
    state: Dict[str, np.ndarray] = {}
    for key in _FITTER_STATE_KEYS:
        if hasattr(fitter, key):
            state[key] = np.asarray(getattr(fitter, key))
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **state)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_fitter(fitter, path: str) -> None:
    """Restore a fitter's optimizer state saved by :func:`save_fitter`."""
    with np.load(path) as data:
        for key in data.files:
            value = data[key]
            if value.ndim == 0:
                value = value.item()
            setattr(fitter, key, value)
