"""Structure = geometry + medium pairing.

Behavioral model: /root/reference/tidy3d/components/structure.py
(Structure:102, MeshOverrideStructure:591).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import pydantic

from ..exceptions import SetupError, ValidationError
from .base import Tidy3dBaseModel, cached_property
from .data.data_array import SpatialDataArray
from .geometry.base import Box, GeometryType
from .medium import CustomMedium, Medium, MediumType
from .types import Bound, Coordinate, annotate_type


class AbstractStructure(Tidy3dBaseModel):
    """Base of structures: a geometry plus display/meta info."""

    geometry: annotate_type(GeometryType) = pydantic.Field(
        ..., title="Geometry", description="Defines the structure's spatial extent."
    )
    name: Optional[str] = pydantic.Field(None, title="Name")


class Structure(AbstractStructure):
    """A geometry with an assigned medium."""

    medium: annotate_type(MediumType) = pydantic.Field(
        ..., title="Medium", description="Defines the electromagnetic properties."
    )
    background_permittivity: Optional[float] = pydantic.Field(
        None, ge=1.0, title="Background Permittivity",
        description="Relative permittivity used for the background of this "
        "structure when computing shape-derivative gradients.",
    )

    def eps_diagonal(self, frequency: float) -> Tuple[complex, complex, complex]:
        return self.medium.eps_diagonal(frequency)

    @cached_property
    def bounds(self) -> Bound:
        return self.geometry.bounds

    @classmethod
    def from_permittivity_array(cls, geometry: GeometryType, eps_data: np.ndarray,
                                **kwargs) -> "Structure":
        """Structure with a pixellated permittivity grid over its bounding box."""
        eps_data = np.asarray(eps_data)
        if eps_data.ndim != 3:
            raise ValidationError("eps_data must be a 3D array")
        rmin, rmax = geometry.bounds
        coords = {}
        for dim, lo, hi, n in zip("xyz", rmin, rmax, eps_data.shape):
            centers = np.linspace(lo, hi, 2 * n + 1)[1::2] if n > 0 else np.array([0.5 * (lo + hi)])
            coords[dim] = centers
        permittivity = SpatialDataArray(eps_data, coords=coords)
        medium = CustomMedium(permittivity=permittivity)
        return cls(geometry=geometry, medium=medium, **kwargs)

    @property
    def viz_spec(self):
        return None


class MeshOverrideStructure(AbstractStructure):
    """A geometry with user-defined mesh step sizes (used by AutoGrid)."""

    dl: Tuple[Optional[pydantic.PositiveFloat], Optional[pydantic.PositiveFloat],
              Optional[pydantic.PositiveFloat]] = pydantic.Field(
        ..., title="Grid Size", description="Grid size along x, y, z; None = no override."
    )
    enforce: bool = pydantic.Field(
        False, title="Enforce Grid Size",
        description="Enforce this override even if finer grids are needed elsewhere.",
    )


StructureType = Union[Structure, MeshOverrideStructure]
