"""Sky masking backends.

The reference runs an ONNX sky-segmentation net + guided upsampling
(mpsfm/extraction/imagewise/mask/models/skyseg.py). Backends here:
``onnx`` when onnxruntime + a model file exist, and ``heuristic`` — a
dependency-free classifier (bright, low-texture, sky-connected-from-top
regions) that covers the common outdoor failure mode (keypoints and
depth priors on sky) without weights. Returns the reference's convention:
True = NOT sky (valid).
"""

from __future__ import annotations

import numpy as np


def sky_mask_heuristic(image_rgb: np.ndarray, brightness_thresh=0.55, texture_thresh=0.02):
    """Returns bool (H,W), True = valid (non-sky)."""
    import cv2

    img = image_rgb.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if img.ndim == 3:
        gray = img.mean(-1)
        # sky tends to be blue-ish and bright
        blueness = img[..., 2] - 0.5 * (img[..., 0] + img[..., 1])
    else:
        gray = img
        blueness = np.zeros_like(gray)
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
    texture = cv2.GaussianBlur(np.abs(gx) + np.abs(gy), (0, 0), 3)

    candidate = (gray > brightness_thresh) & (texture < texture_thresh)
    candidate |= (blueness > 0.08) & (texture < texture_thresh * 2)

    # keep only components connected to the top rows (sky touches the top)
    cand8 = candidate.astype(np.uint8)
    n, labels = cv2.connectedComponents(cand8, connectivity=4)
    top_labels = set(np.unique(labels[:3])) - {0}
    sky = np.isin(labels, list(top_labels)) & candidate
    sky = cv2.morphologyEx(sky.astype(np.uint8), cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8)) > 0
    return ~sky


class SkyMask:
    default_conf = {"backend": "heuristic", "onnx_path": None}

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}
        self._session = None
        if self.conf["backend"] == "onnx":
            import onnxruntime  # noqa: F401 — raises if unavailable

            self._session = onnxruntime.InferenceSession(self.conf["onnx_path"])

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        if self._session is not None:
            return self._onnx(image_rgb)
        return sky_mask_heuristic(image_rgb)

    def _onnx(self, image_rgb):
        """Reference skyseg: 320x320 input, sigmoid output, guided upsample
        approximated by bilinear + threshold."""
        import cv2

        img = cv2.resize(image_rgb.astype(np.float32) / 255.0, (320, 320))
        inp = img.transpose(2, 0, 1)[None]
        out = self._session.run(None, {self._session.get_inputs()[0].name: inp})[0][0, 0]
        prob = cv2.resize(out, (image_rgb.shape[1], image_rgb.shape[0]))
        return prob < 0.5  # True = not sky
