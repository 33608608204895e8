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
    default_conf = {"backend": "heuristic", "onnx_path": None, "thresh": 0.5}

    def __init__(self, conf=None, session=None):
        self.conf = {**self.default_conf, **(conf or {})}
        self._session = session  # injectable for tests (fake onnx session)
        if self._session is None and self.conf["backend"] == "onnx":
            import onnxruntime  # noqa: F401 — raises if unavailable

            self._session = onnxruntime.InferenceSession(self.conf["onnx_path"])

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        if self._session is not None:
            return self._onnx(image_rgb)
        return sky_mask_heuristic(image_rgb)

    def _onnx(self, image_rgb):
        """Reference skyseg pipeline EXACTLY (skyseg.py:148-212): pyrDown
        while >=640, 320x320 ImageNet-normalized inference, min-max output
        normalization, confidence-weighted GUIDED upsampling against the
        full-res image (kernel 256), mask = prob <= thresh (True = not
        sky)."""
        import cv2

        from mpsfm_tpu.extraction.guided_filter import guided_upsample

        original = np.asarray(image_rgb)
        if original.ndim == 2:
            original = np.stack([original] * 3, -1)
        img = original
        while img.shape[0] >= 640 and img.shape[1] >= 640:
            img = cv2.pyrDown(img)
        x = cv2.resize(img.astype(np.float32), (320, 320))
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = (x / 255.0 - mean) / std
        inp = x.transpose(2, 0, 1)[None].astype(np.float32)
        out = self._session.run(None, {self._session.get_inputs()[0].name: inp})[0]
        out = np.asarray(out).squeeze()
        # reference min-max normalization (run_inference, skyseg.py:166-172)
        out = (out - out.min()) / max(out.max() - out.min(), 1e-12)
        prob = guided_upsample(original.astype(np.float64) / 255.0, out, 256)
        return prob <= self.conf["thresh"]  # True = not sky
