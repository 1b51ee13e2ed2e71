"""Engine configuration knobs.

Mirrors the reference option structs exactly (defaults are parity-relevant):
``TileOptions`` and ``Options`` at ``include/mapbox/geojsonvt.hpp:36-62``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TileOptions:
    """Per-tile slicing knobs (reference ``TileOptions``)."""

    tolerance: float = 3.0   # simplification tolerance in tile pixels
    extent: int = 4096       # tile extent
    buffer: int = 64         # tile buffer on each side, in pixels
    line_metrics: bool = False


@dataclass(frozen=True)
class Options(TileOptions):
    """Index build knobs (reference ``Options : TileOptions``)."""

    max_zoom: int = 18          # max zoom to preserve detail on
    index_max_zoom: int = 5     # max zoom in the eager tile index
    index_max_points: int = 100000  # max points per tile in the index
    generate_id: bool = False   # overwrite feature ids with input-order uint64


def to_id(z: int, x: int, y: int) -> int:
    """Packed pyramid tile address.

    Reference: ``toID(z,x,y) = ((2^z * y + x) * 32) + z``
    (``include/mapbox/geojsonvt.hpp:66-68``).
    """
    return (((1 << z) * y + x) * 32) + z


def from_id(tile_id: int) -> tuple[int, int, int]:
    """Inverse of :func:`to_id`."""
    z = tile_id % 32
    n = tile_id // 32
    z2 = 1 << z
    return z, n % z2, n // z2
