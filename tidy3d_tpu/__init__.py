"""tidy3d_tpu — a TPU-native FDTD electromagnetic simulation framework.

API-compatible with the reference client framework (tidy3d) but with the solver
implemented locally as JAX/XLA/Pallas kernels running on TPU, instead of a
cloud round-trip.
"""

from .constants import C_0, EPSILON_0, ETA_0, HBAR, K_B, MU_0, Q_e, inf
from .config import config
from .log import log, set_logging_console, set_logging_file, set_logging_level
from .version import __version__

# populated as the schema layers land; see components/
