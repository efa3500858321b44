from .data import EMESimulationData, EMESMatrixDataset
from .grid import (
    EMECompositeGrid,
    EMEExplicitGrid,
    EMEModeSpec,
    EMEUniformGrid,
)
from .simulation import EMESimulation
from .sweep import EMEFreqSweep, EMELengthSweep, EMEModeSweep
