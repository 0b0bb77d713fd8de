"""fhesim: analytical CKKS accuracy predictor + calibration harness."""

from .simulator import FheAccuracySimulator, Compatibility, SimulatorResult

__all__ = ["FheAccuracySimulator", "Compatibility", "SimulatorResult"]
