from .base import (QuantizationOptimizationPass,
                   QuantizationOptimizationPipeline)
from .baking import ParameterBakingPass
from .calibration import (CalibrationHook, IsotoneCalibrationPass,
                          OperationObserver, RuntimeCalibrationPass)
from .fcalibration import (CompiledCalibrationPass,
                           compiled_calibration_supported)
from .parameters import ParameterQuantizePass, PassiveParameterQuantizePass
from .refine import (MishFusionPass, QuantAlignmentPass, QuantizeFusionPass,
                     QuantizeSimplifyPass, SwishFusionPass)

__all__ = [
    'QuantizationOptimizationPass', 'QuantizationOptimizationPipeline',
    'ParameterBakingPass', 'CalibrationHook', 'IsotoneCalibrationPass',
    'OperationObserver', 'RuntimeCalibrationPass', 'ParameterQuantizePass',
    'PassiveParameterQuantizePass', 'MishFusionPass', 'QuantAlignmentPass',
    'QuantizeFusionPass', 'QuantizeSimplifyPass', 'SwishFusionPass',
]
