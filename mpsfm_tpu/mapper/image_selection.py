"""Next-view and init-pair selection.

Port of the reference's ImageSelection (mpsfm/sfm/mapper/image_selection.py):
init pairs ranked per two-view-geometry config class 2..8 by inlier count;
next image by MAX_MATCHER_INLIER_SCORES — the sum of inlier match scores
against registered images, discounted by ignored-match masks.
"""

from __future__ import annotations

import numpy as np

from mpsfm_tpu.config import BaseClass
from mpsfm_tpu.scene.reconstruction import Reconstruction


class ImageSelection(BaseClass):
    default_conf = {
        "image_selection_method": "MAX_MATCHER_INLIER_SCORES",
        "init_max_config": 8,
        "verbose": 0,
    }

    def _init(self, rec: Reconstruction, corr):
        self.rec = rec
        self.corr = corr  # Correspondences facade
        self.freeze_imids: set = set()
        self.candid = None
        self.registration_order: list = []

    def find_init_pairs(self, exclude_init_pairs=None):
        """Ranked init pairs: config classes 2..8 in order, by inliers
        (reference :42-76)."""
        exclude = exclude_init_pairs or set()
        proposals = []
        for config_class in range(2, self.conf.init_max_config + 1):
            impairs = []
            inliers = []
            for (imid1, imid2) in self.corr.image_pairs():
                if (imid1, imid2) in exclude or (imid2, imid1) in exclude:
                    continue
                tvg = self.corr.two_view_geom_by_ids(imid1, imid2)
                if tvg is None or int(tvg.config) != config_class:
                    continue
                impairs.append((imid1, imid2))
                inliers.append(len(tvg.inlier_matches))
            order = np.argsort(np.asarray(inliers))[::-1] if impairs else []
            proposals.extend(impairs[i] for i in order)
        return proposals

    def rank_image(self, imid):
        """MAX_MATCHER_INLIER_SCORES (reference :134-148)."""
        rec = self.rec
        best_score, best_ref, total = 0.0, None, 0.0
        im = rec.images[imid]
        for ref_id in rec.registered_images:
            s = self.corr.inlier_match_score(imid, ref_id)
            if ref_id in im.ignore_matches_AP:
                mask = im.ignore_matches_AP[ref_id]
                if mask.sum() > 0:
                    s *= (~mask).sum() / mask.sum()
            total += s
            if s > best_score:
                best_score, best_ref = s, ref_id
        return {"score": best_score, "refid": best_ref}

    def next_image(self, qry_imids=None):
        rec = self.rec
        if qry_imids is None:
            qry_imids = [
                i
                for i, im in rec.images.items()
                if not im.registered and i not in self.freeze_imids
            ]
        if not qry_imids:
            return False
        ranked = [self.rank_image(i) for i in qry_imids]
        scores = [r["score"] for r in ranked]
        best = int(np.argmax(scores))
        rec.best_next_ref_imid = ranked[best]["refid"]
        self.candid = qry_imids[best]
        return True

    def at_success(self):
        self.freeze_imids = set()
        self.registration_order.append(self.candid)

    def at_failure(self, imid):
        self.freeze_imids.add(imid)
