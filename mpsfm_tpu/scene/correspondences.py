"""Correspondences facade: keypoints + verified matches + two-view geometry.

Port of the reference's Correspondences
(mpsfm/sfm/scene/correspondences/base.py): ingests per-image keypoints and
per-pair matches (from the extraction caches), runs geometric verification
— here one batched device program over all pairs instead of a process
pool — populates the correspondence graph with inlier matches, and keeps
the per-pair inlier score table used for next-view ranking.
"""

from __future__ import annotations

import numpy as np

from mpsfm_tpu.config import BaseClass
from mpsfm_tpu.estimators.two_view import estimate_two_view_geometry_batch
from mpsfm_tpu.scene.corrgraph import CorrespondenceGraph
from mpsfm_tpu.scene.reconstruction import Reconstruction


class Correspondences(BaseClass):
    default_conf = {
        "max_error": 4.0,
        "num_hyp": 512,
        "min_num_matches": 15,
        "verbose": 0,
    }

    def _init(self, rec: Reconstruction):
        self.rec = rec
        self.cg = CorrespondenceGraph()
        self._tvg: dict[tuple[int, int], object] = {}
        self.inlier_match_scores: dict[frozenset, float] = {}

    def populate(self, keypoints: dict, matches: dict, scores: dict | None = None):
        """keypoints: name -> (N,2) px; matches: (name0,name1) -> (M,2);
        scores: frozenset(names) -> (M,) match confidences (optional)."""
        rec = self.rec
        for name, kps in keypoints.items():
            imid = rec.imid(name)
            im = rec.images[imid]
            im.keypoints = np.asarray(kps, np.float64)
            if len(im.point3D_ids) != len(im.keypoints):
                im.point3D_ids = np.full(len(im.keypoints), -1, np.int64)
            self.cg.add_image(imid, len(kps))

        pair_list = []
        pair_names = []
        for (name0, name1), m in matches.items():
            if m is None or len(m) < self.conf.min_num_matches:
                continue
            id0, id1 = rec.imid(name0), rec.imid(name1)
            pair_list.append(
                (
                    rec.camera(id0).device(),
                    rec.camera(id1).device(),
                    keypoints[name0],
                    keypoints[name1],
                    np.asarray(m, np.int64),
                )
            )
            pair_names.append((name0, name1))
        self.log(f"Verifying {len(pair_list)} pairs...", level=1)
        tvgs = estimate_two_view_geometry_batch(
            pair_list, max_error_px=self.conf.max_error, num_hyp=self.conf.num_hyp
        )
        for (name0, name1), tvg in zip(pair_names, tvgs):
            id0, id1 = rec.imid(name0), rec.imid(name1)
            self._tvg[(id0, id1)] = tvg
            if len(tvg.inlier_matches) == 0:
                self.inlier_match_scores[frozenset((id0, id1))] = 0.0
                continue
            self.cg.add_correspondences(id0, id1, tvg.inlier_matches)
            key = frozenset((name0, name1))
            if scores is not None and key in scores:
                m = matches[(name0, name1)]
                s = np.asarray(scores[key])
                inl = np.zeros(len(m), bool)
                mset = {tuple(r) for r in tvg.inlier_matches.tolist()}
                for i, r in enumerate(np.asarray(m).tolist()):
                    if tuple(r) in mset:
                        inl[i] = True
                self.inlier_match_scores[frozenset((id0, id1))] = float(s[inl].sum())
            else:
                self.inlier_match_scores[frozenset((id0, id1))] = float(len(tvg.inlier_matches))
        self.cg.finalize()
        return True

    # --- query API ---
    def matches(self, imid1, imid2):
        return self.cg.matches(imid1, imid2)

    def two_view_geom_by_ids(self, imid1, imid2):
        if (imid1, imid2) in self._tvg:
            return self._tvg[(imid1, imid2)]
        if (imid2, imid1) in self._tvg:
            return self._tvg[(imid2, imid1)].invert()
        return None

    def inlier_match_score(self, imid1, imid2):
        return self.inlier_match_scores.get(frozenset((imid1, imid2)), 0.0)

    def image_pairs(self):
        return sorted(self._tvg.keys())
