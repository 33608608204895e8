from mpsfm_tpu.extraction.base import Extraction

__all__ = ["Extraction"]
