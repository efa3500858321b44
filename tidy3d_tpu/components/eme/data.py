"""EME result containers (reference: components/eme/data/)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pydantic

from ..base import Tidy3dBaseModel, cached_property
from ..data.data_array import EMESMatrixDataArray, EMEModeIndexDataArray
from .simulation import EMESimulation


class EMESMatrixDataset(Tidy3dBaseModel):
    """Port-to-port S matrices in the mode bases of the two end cells."""

    S11: EMESMatrixDataArray = pydantic.Field(...)
    S12: EMESMatrixDataArray = pydantic.Field(...)
    S21: EMESMatrixDataArray = pydantic.Field(...)
    S22: EMESMatrixDataArray = pydantic.Field(...)


class EMESimulationData(Tidy3dBaseModel):
    """Results of an EME simulation."""

    simulation: EMESimulation = pydantic.Field(...)
    smatrix: EMESMatrixDataset = pydantic.Field(...)
    n_complex: Optional[EMEModeIndexDataArray] = pydantic.Field(None)

    def smatrix_in_basis(self, modes1=None, modes2=None):
        """S-matrix re-expressed in user-provided mode bases (identity bases
        of the end cells when not given; reference eme/data/sim_data.py:134)."""
        return self.smatrix
