"""Numeric tuple algebra for halos and compute extents.

TPU-native re-design of the reference's ``Extent``/``Boundary`` concepts
(reference: src/gt4py/cartesian/gtc/definitions.py:18-629).  An ``Extent``
records, per axis, the (lo, hi) offsets by which a computation or field
access region extends beyond the compute domain; ``lo <= 0 <= hi`` after
union with the zero extent.  Boundaries (halo widths) are the non-negative
mirror ``(-lo, hi)``.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple


@dataclasses.dataclass(frozen=True)
class Extent:
    """Per-axis (lo, hi) growth of a region relative to the compute domain."""

    i: Tuple[int, int] = (0, 0)
    j: Tuple[int, int] = (0, 0)
    k: Tuple[int, int] = (0, 0)

    @classmethod
    def zeros(cls) -> "Extent":
        return cls()

    @classmethod
    def from_offset(cls, di: int = 0, dj: int = 0, dk: int = 0) -> "Extent":
        return cls(i=(di, di), j=(dj, dj), k=(dk, dk))

    def __or__(self, other: "Extent") -> "Extent":
        """Union (hull) of two extents."""
        return Extent(
            i=(min(self.i[0], other.i[0]), max(self.i[1], other.i[1])),
            j=(min(self.j[0], other.j[0]), max(self.j[1], other.j[1])),
            k=(min(self.k[0], other.k[0]), max(self.k[1], other.k[1])),
        )

    def __add__(self, other: "Extent") -> "Extent":
        """Compose extents (access at offset within an extended region)."""
        return Extent(
            i=(self.i[0] + other.i[0], self.i[1] + other.i[1]),
            j=(self.j[0] + other.j[0], self.j[1] + other.j[1]),
            k=(self.k[0] + other.k[0], self.k[1] + other.k[1]),
        )

    def union_zero(self) -> "Extent":
        return self | Extent.zeros()

    @property
    def horizontal(self) -> "Extent":
        return Extent(i=self.i, j=self.j)

    def to_boundary(self) -> "Boundary":
        e = self.union_zero()
        return Boundary(
            i=(-e.i[0], e.i[1]), j=(-e.j[0], e.j[1]), k=(-e.k[0], e.k[1])
        )

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        return iter((self.i, self.j, self.k))


@dataclasses.dataclass(frozen=True)
class Boundary:
    """Non-negative halo widths per axis: (lower, upper)."""

    i: Tuple[int, int] = (0, 0)
    j: Tuple[int, int] = (0, 0)
    k: Tuple[int, int] = (0, 0)

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        return iter((self.i, self.j, self.k))

    @property
    def lower_indices(self) -> Tuple[int, int, int]:
        return (self.i[0], self.j[0], self.k[0])

    @property
    def upper_indices(self) -> Tuple[int, int, int]:
        return (self.i[1], self.j[1], self.k[1])
