"""tidy3d_tpu — a TPU-native FDTD electromagnetic simulation framework.

API-compatible with the reference client framework (tidy3d @ v2.7.6) but with
the solver implemented locally as JAX/XLA/Pallas kernels running on TPU,
instead of a cloud round-trip (see SURVEY.md).
"""

from . import _malloc  # noqa: F401  (glibc tuning; must run before numpy allocs)
from .constants import C_0, EPSILON_0, ETA_0, HBAR, K_B, MU_0, Q_e, inf
from .config import config
from .log import log, set_logging_console, set_logging_file, set_logging_level
from .version import __version__

# --- base / types ---------------------------------------------------------- #
from .components.base import Tidy3dBaseModel
from .components.types import Coordinate, Size, Symmetry

# --- geometry -------------------------------------------------------------- #
from .components.geometry.base import (
    Box,
    ClipOperation,
    Geometry,
    GeometryGroup,
    Transformed,
)
from .components.geometry.primitives import Cylinder, Sphere
from .components.geometry.polyslab import ComplexPolySlabBase, PolySlab
from .components.geometry.mesh import TriangleMesh

# --- mediums --------------------------------------------------------------- #
from .components.medium import (
    PEC,
    AbstractMedium,
    AnisotropicMedium,
    CustomAnisotropicMedium,
    CustomIsotropicMedium,
    CustomDebye,
    CustomDrude,
    CustomLorentz,
    CustomMedium,
    CustomPoleResidue,
    CustomSellmeier,
    PerturbationMedium,
    PerturbationPoleResidue,
    Debye,
    Drude,
    FullyAnisotropicMedium,
    KerrNonlinearity,
    Lorentz,
    Medium,
    Medium2D,
    NonlinearSpec,
    NonlinearSusceptibility,
    PECMedium,
    PoleResidue,
    Sellmeier,
    TwoPhotonAbsorption,
)

# --- structures / scene ---------------------------------------------------- #
from .components.structure import MeshOverrideStructure, Structure
from .components.scene import Scene

# --- grid ------------------------------------------------------------------ #
from .components.grid.grid import Coords, FieldGrid, Grid, YeeGrid
from .components.grid.grid_spec import (
    AutoGrid,
    CustomGrid,
    CustomGridBoundaries,
    GridSpec,
    UniformGrid,
)
from .components.grid.mesher import GradedMesher

# --- boundaries ------------------------------------------------------------ #
from .components.boundary import (
    PML,
    Absorber,
    AbsorberParams,
    BlochBoundary,
    Boundary,
    BoundarySpec,
    BoundaryEdge,
    DefaultAbsorberParameters,
    DefaultPMLParameters,
    DefaultStablePMLParameters,
    PECBoundary,
    Periodic,
    PMCBoundary,
    PMLParams,
    StablePML,
)

# --- sources --------------------------------------------------------------- #
from .components.source import (
    TFSF,
    AstigmaticGaussianBeam,
    ContinuousWave,
    CustomCurrentSource,
    CustomFieldSource,
    CustomSourceTime,
    GaussianBeam,
    GaussianPulse,
    ModeSource,
    PlaneWave,
    PointDipole,
    Source,
    SourceTime,
    UniformCurrentSource,
)

# --- monitors -------------------------------------------------------------- #
from .components.monitor import (
    DiffractionMonitor,
    FieldMonitor,
    FieldTimeMonitor,
    FieldProjectionAngleMonitor,
    FieldProjectionCartesianMonitor,
    FieldProjectionKSpaceMonitor,
    FluxMonitor,
    FluxTimeMonitor,
    ModeMonitor,
    ModeSolverMonitor,
    Monitor,
    PermittivityMonitor,
)

# --- mode / apodization ---------------------------------------------------- #
from .components.mode import ModeSpec
from .components.apodization import ApodizationSpec

# --- simulation ------------------------------------------------------------ #
from .components.simulation import Simulation
from .components.subpixel_spec import (
    HeuristicPECStaircasing,
    PECConformal,
    PolarizedAveraging,
    Staircasing,
    SubpixelSpec,
    VolumetricAveraging,
)

# --- data ------------------------------------------------------------------ #
from .components.data.data_array import (
    ChargeDataArray,
    DataArray,
    DiffractionDataArray,
    FieldProjectionAngleDataArray,
    FieldProjectionCartesianDataArray,
    FieldProjectionKSpaceDataArray,
    FluxDataArray,
    FluxTimeDataArray,
    FreqDataArray,
    FreqModeDataArray,
    GroupIndexDataArray,
    HeatDataArray,
    ModeAmpsDataArray,
    ModeIndexDataArray,
    ScalarFieldDataArray,
    ScalarFieldTimeDataArray,
    ScalarModeFieldDataArray,
    SpatialDataArray,
    TimeDataArray,
)
from .components.data.dataset import (
    FieldDataset,
    FieldTimeDataset,
    ModeSolverDataset,
    PermittivityDataset,
)
from .components.data.monitor_data import (
    DiffractionData,
    FieldData,
    FieldTimeData,
    FluxData,
    FluxTimeData,
    ModeData,
    ModeSolverData,
    PermittivityData,
)
from .components.data.sim_data import SimulationData

# --- EME ------------------------------------------------------------------- #
from .components.eme.data import (
    EMECoefficientData,
    EMEFieldData,
    EMEModeSolverData,
    EMESimulationData,
    EMESMatrixDataset,
)
from .components.eme.monitor import (
    EMECoefficientMonitor,
    EMEFieldMonitor,
    EMEModeSolverMonitor,
)
from .components.eme.grid import (
    EMECompositeGrid,
    EMEExplicitGrid,
    EMEModeSpec,
    EMEUniformGrid,
)
from .components.eme.simulation import EMESimulation
from .components.eme.sweep import EMEFreqSweep, EMELengthSweep, EMEModeSweep

# --- heat ------------------------------------------------------------------ #
from .components.heat.boundary import (
    ConvectionBC,
    HeatBoundarySpec,
    HeatFluxBC,
    MediumMediumInterface,
    SimulationBoundary,
    StructureBoundary,
    StructureSimulationBoundary,
    StructureStructureInterface,
    TemperatureBC,
)
from .components.heat.data import HeatSimulationData, TemperatureData
from .components.heat.heat_spec import FluidSpec, SolidSpec
from .components.heat.monitor import TemperatureMonitor
from .components.heat.simulation import HeatSimulation
from .components.heat.source import UniformHeatSource

# --- lumped elements / perturbations / modulation -------------------------- #
from .components.lumped_element import CoaxialLumpedResistor, LumpedResistor
from .components.parameter_perturbation import (
    CustomChargePerturbation,
    CustomHeatPerturbation,
    IndexPerturbation,
    LinearChargePerturbation,
    LinearHeatPerturbation,
    ParameterPerturbation,
    PermittivityPerturbation,
)
from .components.time_modulation import (
    ContinuousWaveTimeModulation,
    ModulationSpec,
    SpaceTimeModulation,
    SpatialModulationCustom,
    SpatialModulationUniform,
)
from .components.run_time_spec import RunTimeSpec
from .updater import Updater

from .components.data.unstructured import (
    CellDataArray,
    IndexedDataArray,
    PointDataArray,
    TetrahedralGridDataset,
    TriangularGridDataset,
)

# --- material library ------------------------------------------------------ #
from .material_library.material_library import material_library
from .material_library.parametric_materials import Graphene

# --- execution ------------------------------------------------------------- #
from . import web

# enable the persistent compilation cache: remote TPU compiles are slow and
# repeat across sessions for identical program shapes
import os as _os

try:  # pragma: no cover
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.tidy3d_tpu_jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass
