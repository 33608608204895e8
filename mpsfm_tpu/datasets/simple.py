"""SimpleParser: images dir + intrinsics.yaml -> reconstruction skeleton.

Port of the reference's SimpleParser (mpsfm/data_proc/simple.py:14-91):
intrinsics.yaml maps camera ids to PINHOLE params [fx, fy, cx, cy] and an
image list ('all' or explicit names); optional sensor depth maps sit next
to the images for the measured-RGB-D path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

from mpsfm_tpu.scene.reconstruction import HostCamera, ImageRecord, Reconstruction

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".JPG", ".PNG", ".JPEG"}


class SimpleParser:
    def __init__(self, data_dir, images_dir=None, intrinsics_path=None, depth_dir=None, normscale=387.0):
        self.data_dir = Path(data_dir)
        self.rgb_dir = Path(images_dir) if images_dir else self.data_dir / "images"
        self.intrinsics_path = (
            Path(intrinsics_path) if intrinsics_path else self.data_dir / "intrinsics.yaml"
        )
        if depth_dir:
            self.depth_dir = Path(depth_dir)
        elif (self.data_dir / "depth").is_dir():
            self.depth_dir = self.data_dir / "depth"  # RGB-D layout auto-detect
        else:
            self.depth_dir = None
        self.normscale = normscale
        self._names = sorted(
            p.name for p in self.rgb_dir.iterdir() if p.suffix in IMAGE_EXTS
        )
        # name -> intrinsics params (fx, fy, cx, cy) for prior backends
        self._intrinsics_of: dict[str, np.ndarray] = {}
        if self.intrinsics_path.exists():
            with open(self.intrinsics_path) as f:
                intr = yaml.safe_load(f)
            for _, spec in intr.items():
                params = np.asarray(spec["params"], np.float64)
                targets = self._names if spec.get("images", "all") == "all" else [
                    Path(n).name for n in spec["images"]
                ]
                for n in targets:
                    self._intrinsics_of[n] = params

    def image_names(self):
        return list(self._names)

    def image_path(self, name):
        return self.rgb_dir / name

    def build_reconstruction(self) -> Reconstruction:
        import cv2

        with open(self.intrinsics_path) as f:
            intr = yaml.safe_load(f)
        rec = Reconstruction()
        name_to_cam = {}
        for cam_id, spec in intr.items():
            params = np.asarray(spec["params"], np.float64)
            images = spec.get("images", "all")
            if images == "all":
                targets = self._names
            else:
                targets = [Path(n).name for n in images]
            # image size from the first target
            sample = cv2.imread(str(self.rgb_dir / targets[0]))
            H, W = sample.shape[:2]
            cam = HostCamera(int(cam_id), params, W, H)
            cam.set_integration_grid(self.normscale)
            rec.add_camera(cam)
            for name in targets:
                name_to_cam[name] = int(cam_id)
        for imid, name in enumerate(self._names):
            if name not in name_to_cam:
                continue
            rec.add_image(ImageRecord(imid, name, name_to_cam[name]))
        return rec

    def prior_inputs(self, name) -> dict:
        """Extra inputs for prior backends (sensor depth, intrinsics)."""
        out = {}
        if name in self._intrinsics_of:
            p = self._intrinsics_of[name]
            out["intrinsics"] = (float(p[0]), float(p[1]), float(p[2]), float(p[3]))
        if self.depth_dir is not None:
            for ext in (".npy", ".png"):
                p = self.depth_dir / (Path(name).stem + ext)
                if p.exists():
                    if ext == ".npy":
                        out["depth_measured"] = np.load(p)
                    else:
                        import cv2

                        out["depth_measured"] = (
                            cv2.imread(str(p), cv2.IMREAD_ANYDEPTH).astype(np.float64) / 1000.0
                        )
                    break
        return out
