from .path_integrals import (
    AxisAlignedPathIntegral,
    CurrentIntegralAxisAligned,
    ImpedanceCalculator,
    VoltageIntegralAxisAligned,
)
