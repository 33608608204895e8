from mpsfm_tpu.datasets.simple import SimpleParser

__all__ = ["SimpleParser"]
