from mpsfm_tpu.mapper.mapper import MpsfmMapper

__all__ = ["MpsfmMapper"]
