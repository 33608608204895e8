from mpsfm_tpu.scene.reconstruction import HostCamera, ImageRecord, Reconstruction
from mpsfm_tpu.scene.corrgraph import CorrespondenceGraph

__all__ = ["HostCamera", "ImageRecord", "Reconstruction", "CorrespondenceGraph"]
