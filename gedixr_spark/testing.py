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
    """dict with h5py.Group's ``keys()`` and nested-path access
    contracts (``group['geolocation/lat_lowestmode']`` resolves through
    subgroups, exactly like h5py — the L2B layer paths need it)."""

    def keys(self):
        return set(super().keys())

    def __getitem__(self, key):
        if "/" in key:
            head, rest = key.split("/", 1)
            return super().__getitem__(head)[rest]
        return super().__getitem__(key)

    def __contains__(self, key):
        if "/" in key:
            head, rest = key.split("/", 1)
            return super().__contains__(head) and rest in super().__getitem__(head)
        return super().__contains__(key)


def make_granule(
    n_shots: int,
    beams: list[str],
    with_rh: bool = True,
    seed: int = 0,
    product: str = "L2A",
) -> FakeGroup:
    """Fake granule with the product's real group layout: L2A keeps
    geolocation layers at the beam level; L2B nests them under
    ``geolocation/`` and uses ``l2b_quality_flag`` (reference
    constants.py:20-37)."""
    g = FakeGroup()
    rng = np.random.default_rng(seed)
    for i, beam in enumerate(beams):
        ids = np.arange(n_shots, dtype=np.uint64) + 10_000_000 * (i + 1)
        elev = rng.uniform(0, 3000, n_shots)
        geo = dict(
            lat_lowestmode=rng.uniform(40, 55, n_shots),
            lon_lowestmode=rng.uniform(-10, 10, n_shots),
            elev_lowestmode=elev,
            # DEM tracks elevation with noise so the quality filter's
            # abs(Δelev) < 100 keeps most shots (FIXTURES.md §1 domain)
            digital_elevation_model=elev + rng.normal(0, 60, n_shots),
            degrade_flag=np.zeros(n_shots, dtype=np.int8),
        )
        grp = FakeGroup(
            shot_number=ids,
            sensitivity=rng.uniform(0.85, 1.0, n_shots),
            num_detectedmodes=rng.integers(1, 6, n_shots).astype(np.int32),
        )
        if product == "L2B":
            grp["geolocation"] = FakeGroup(**geo)
            grp["l2b_quality_flag"] = np.ones(n_shots, dtype=np.int8)
            grp["cover"] = rng.uniform(0, 1, n_shots)
            grp["fhd_normal"] = rng.uniform(0, 4, n_shots)
            grp["pai"] = rng.uniform(0, 10, n_shots)
            grp["rh100"] = rng.uniform(0, 60, n_shots)
        else:
            grp.update(geo)
            grp["quality_flag"] = np.ones(n_shots, dtype=np.int8)
            if with_rh:
                grp["rh"] = rng.uniform(0, 60, (n_shots, 101))
        g[beam] = grp
    return g


def build_opener(granules: dict):
    """Context-manager opener keyed by file name; raises on 'corrupt'
    paths to exercise per-granule fault isolation (extract.py:191-194)."""

    @contextlib.contextmanager
    def opener(path):
        # match on the file NAME only — test tmp dirs can contain the
        # word 'corrupt' in their path
        if "corrupt" in Path(path).name:
            raise OSError("truncated HDF5 file")
        yield granules[Path(path).name]

    return opener
