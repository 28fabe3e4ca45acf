"""Concorde / TSPLIB instance conversion.

The reference ships ``data/tsp/convert.py`` (SURVEY §2.1 #23) turning Concorde
TSP files into coordinate tensors; this is the equivalent for numpy/JAX
pipelines, plus a TSPLIB ``NODE_COORD_SECTION`` reader.
"""
from __future__ import annotations

import numpy as np


def parse_tsplib(text: str) -> np.ndarray:
    """Read a TSPLIB/Concorde file with a NODE_COORD_SECTION → ``[n, 2]``."""
    lines = iter(text.splitlines())
    coords = []
    in_section = False
    for line in lines:
        token = line.strip()
        if token.upper().startswith("NODE_COORD_SECTION"):
            in_section = True
            continue
        if not in_section:
            continue
        if token.upper() in ("EOF", "") or token.upper().startswith("TOUR"):
            break
        parts = token.split()
        coords.append([float(parts[1]), float(parts[2])])
    if not coords:
        raise ValueError("no NODE_COORD_SECTION found")
    return np.asarray(coords, np.float32)


def normalize_coords(coords: np.ndarray) -> np.ndarray:
    """Scale into the unit square (the training distribution)."""
    lo = coords.min(axis=0)
    span = coords.max(axis=0) - lo
    return (coords - lo) / max(float(span.max()), 1e-9)


def convert_file(path: str, out_path: str, normalize: bool = True) -> np.ndarray:
    with open(path) as f:
        coords = parse_tsplib(f.read())
    if normalize:
        coords = normalize_coords(coords)
    np.save(out_path, coords)
    return coords
