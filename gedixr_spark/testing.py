"""Deterministic fake GEDI granules for reader tests.

h5py isn't installed in this environment (SURVEY.md §7.3), so tests
exercise the S2 reader's real Spark plumbing (inventory → mapInPandas →
shot schema) against an in-memory granule with the same group/dataset
layout an h5py.File exposes: 8 beam groups, per-beam 1-D layer datasets,
and the 101-wide ``rh`` percentile matrix.

Lives inside the package (not under tests/) so cloudpickle can resolve
these classes by module reference on Spark workers.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import numpy as np


class FakeGroup(dict):
    """dict with h5py.Group's ``keys()`` contract."""

    def keys(self):
        return set(super().keys())


def make_granule(n_shots: int, beams: list[str], with_rh: bool = True, seed: int = 0) -> FakeGroup:
    g = FakeGroup()
    rng = np.random.default_rng(seed)
    for i, beam in enumerate(beams):
        ids = np.arange(n_shots, dtype=np.uint64) + 10_000_000 * (i + 1)
        grp = FakeGroup(
            shot_number=ids,
            lat_lowestmode=rng.uniform(40, 55, n_shots),
            lon_lowestmode=rng.uniform(-10, 10, n_shots),
            elev_lowestmode=rng.uniform(0, 3000, n_shots),
            digital_elevation_model=rng.uniform(0, 3000, n_shots),
            degrade_flag=np.zeros(n_shots, dtype=np.int8),
            quality_flag=np.ones(n_shots, dtype=np.int8),
            sensitivity=rng.uniform(0.85, 1.0, n_shots),
            num_detectedmodes=rng.integers(1, 6, n_shots).astype(np.int32),
        )
        if with_rh:
            grp["rh"] = rng.uniform(0, 60, (n_shots, 101))
        g[beam] = grp
    return g


def build_opener(granules: dict):
    """Context-manager opener keyed by file name; raises on 'corrupt'
    paths to exercise per-granule fault isolation (extract.py:191-194)."""

    @contextlib.contextmanager
    def opener(path):
        if "corrupt" in path:
            raise OSError("truncated HDF5 file")
        yield granules[Path(path).name]

    return opener
