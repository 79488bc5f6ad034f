"""JSON IO helpers (counterpart of mani_skill/utils/io_utils.py)."""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class _NumpyEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


def dump_json(path, obj, **kwargs):
    kwargs.setdefault("cls", _NumpyEncoder)
    kwargs.setdefault("indent", 2)
    with open(path, "w") as f:
        json.dump(obj, f, **kwargs)


def load_json(path):
    with open(path) as f:
        return json.load(f)
