from mpsfm_tpu.integration.bini import BiniParams, bini_solve, build_integration_inputs, Integrator

__all__ = ["BiniParams", "bini_solve", "build_integration_inputs", "Integrator"]
