"""Heat result containers (reference: tidy3d/components/heat/data/)."""

from __future__ import annotations

from typing import Dict, Tuple

import pydantic

from ..base import Tidy3dBaseModel, cached_property
from ..data.data_array import SpatialDataArray
from ..types import annotate_type
from .monitor import TemperatureMonitor


class TemperatureData(Tidy3dBaseModel):
    """Temperature field of one monitor."""

    monitor: TemperatureMonitor = pydantic.Field(...)
    temperature: SpatialDataArray = pydantic.Field(..., title="Temperature [K]")


class HeatSimulationData(Tidy3dBaseModel):
    """Results of a heat simulation."""

    simulation: object = pydantic.Field(...)
    data: Tuple[TemperatureData, ...] = pydantic.Field(...)

    @cached_property
    def monitor_data(self) -> Dict[str, TemperatureData]:
        return {d.monitor.name: d for d in self.data}

    def __getitem__(self, name: str) -> TemperatureData:
        return self.monitor_data[name]
