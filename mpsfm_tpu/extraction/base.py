"""Extraction facade: features, matches, priors, masks, with HDF5 caches.

Port of the reference's Extraction orchestrator (mpsfm/extraction/base.py):
every artifact is an HDF5 cache keyed by image/pair names, present keys
are skipped unless the artifact class is listed in ``extract`` (the
overwrite flags), and the mapper consumes the caches — files are the seam
between extraction and mapping. The fork's measured-RGB-D injection
(use_measured, base.py:177-224) is a first-class backend here.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mpsfm_tpu.config import BaseClass
from mpsfm_tpu.extraction.features.classical import ClassicalFeatures
from mpsfm_tpu.extraction.features.superpoint import SuperPoint
from mpsfm_tpu.extraction.matchers.dense_ncc import DenseNCCMatcher


def get_dense_matcher(name: str, conf=None):
    """Dense matcher registry: classical NCC flow, the two-view
    cross-attention net (MASt3R-class), or the warp regressor
    (RoMa-class)."""
    if name in ("dense_ncc", "ncc"):
        return DenseNCCMatcher(conf)
    if name in ("two_view", "mast3r_class"):
        from mpsfm_tpu.extraction.nets.two_view import TwoViewMatcher

        return TwoViewMatcher(conf)
    if name == "mast3r":
        # the EXACT MASt3R arch (nets/mast3r.py, official checkpoint naming)
        from mpsfm_tpu.extraction.nets.mast3r import Mast3rMatcher

        return Mast3rMatcher(conf)
    if name in ("warp", "roma_class"):
        from mpsfm_tpu.extraction.nets.warp import WarpMatcher

        return WarpMatcher(conf)
    if name == "roma":
        # the EXACT RoMa arch (nets/roma.py, official checkpoint naming)
        from mpsfm_tpu.extraction.nets.roma import RomaMatcher

        return RomaMatcher(conf)
    raise ValueError(f"unknown dense matcher '{name}'")
from mpsfm_tpu.extraction.matchers.lightglue import LightGlue
from mpsfm_tpu.extraction.matchers.nn import MutualNNMatcher
from mpsfm_tpu.extraction.pairs import pairs_exhaustive, pairs_from_retrieval, pairs_sequential
from mpsfm_tpu.extraction.priors import get_prior_backend, normals_from_depth
from mpsfm_tpu.utils import io


FEATURE_MODELS = {"superpoint": SuperPoint, "classical": ClassicalFeatures}
MATCHER_MODELS = {"lightglue": LightGlue, "nn": MutualNNMatcher}


class Extraction(BaseClass):
    default_conf = {
        "features": "classical",  # superpoint once weights are present
        "matcher": "nn",
        "dense_matcher": "dense_ncc",
        "sharded_inference": True,  # batch + mesh-shard batchable models
        "matches_mode": "sparse",  # sparse | dense | sparse+dense (+measured)
        "depth": "oracle",
        "normals": "from_depth",
        "normals_conf": {},
        "pairs_type": "exhaustive",  # exhaustive | sequential | retrieval
        "n_retrieval": 20,
        "seq_overlap": 10,
        "retrieval": "grid",  # grid | netvlad (needs retrieval_conf.weights_path)
        "retrieval_conf": {},
        "masks": "none",  # none | heuristic | onnx (sky masking)
        "mask_conf": {},
        "feature_conf": {},
        "matcher_conf": {},
        "dense_matcher_conf": {},
        "depth_conf": {},
        "resize_max": 1600,
        "verbose": 0,
    }

    def _init(self, scene_parser, cache_dir, extract=(), models=None):
        self.scene_parser = scene_parser
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.extract = set(extract)
        models = models or {}
        self.feature_model = models.get("features")
        self.matcher_model = models.get("matcher")
        self.depth_backend = models.get("depth")
        self.paths = {
            "sfeats": self.cache_dir / f"feats-{self.conf.features}.h5",
            "smatches": self.cache_dir / f"matches-{self.conf.matcher}.h5",
            "dpairs": self.cache_dir / f"dense-{self.conf.dense_matcher}.h5",
            "pair_depth": self.cache_dir / f"pair-depth-{self.conf.dense_matcher}.h5",
            "depth": self.cache_dir / f"depth-{self.conf.depth}.h5",
            "normals": self.cache_dir / f"normals-{self.conf.normals}.h5",
            "masks": self.cache_dir / "masks.h5",
            "pairs": self.cache_dir / "pairs.txt",
        }
        self.sfm_pairs_path = self.paths["pairs"]

    # ---------- models ----------
    def _get_feature_model(self):
        if self.feature_model is None:
            cls = FEATURE_MODELS[self.conf.features]
            self.feature_model = cls(dict(self.conf.feature_conf))
            if self.conf.features == "superpoint" and self.feature_model.params is None:
                raise RuntimeError(
                    "SuperPoint selected but no weights_path configured; "
                    "use features='classical' or provide a checkpoint."
                )
        return self.feature_model

    def _get_matcher(self):
        if self.matcher_model is None:
            cls = MATCHER_MODELS[self.conf.matcher]
            self.matcher_model = cls(dict(self.conf.matcher_conf))
            if self.conf.matcher == "lightglue" and self.matcher_model.params is None:
                raise RuntimeError(
                    "LightGlue selected but no weights_path configured; "
                    "use matcher='nn' or provide a checkpoint."
                )
        return self.matcher_model

    # ---------- image loading ----------
    def _load_gray(self, name):
        img = io.read_image(self.scene_parser.image_path(name), grayscale=True)
        scale = 1.0
        m = self.conf.resize_max
        if m and max(img.shape) > m:
            import cv2

            scale = m / max(img.shape)
            img = cv2.resize(img, (int(round(img.shape[1] * scale)), int(round(img.shape[0] * scale))))
        return img.astype(np.float32) / 255.0, scale

    # ---------- pairs ----------
    def extract_pairs(self):
        names = self.scene_parser.image_names()
        if self.paths["pairs"].exists() and "p" not in self.extract:
            return io.read_pairs(self.paths["pairs"])
        if self.conf.pairs_type == "exhaustive":
            pairs = pairs_exhaustive(names)
        elif self.conf.pairs_type == "sequential":
            pairs = pairs_sequential(names, self.conf.seq_overlap)
        elif self.conf.pairs_type == "retrieval":
            descs = self._global_descriptors(names)
            pairs = pairs_from_retrieval(names, descs, self.conf.n_retrieval)
        else:
            raise ValueError(self.conf.pairs_type)
        io.write_pairs(self.paths["pairs"], pairs)
        return pairs

    def _global_descriptors(self, names):
        """Global descriptors for retrieval (reference
        pairs_from_retrieval.py:47-114): NetVLAD when configured with
        weights (Pitts30K .mat or torch export), else the dependency-free
        grid-intensity descriptor (validated against exhaustive recall in
        tests/test_dense_retrieval_masks.py)."""
        if self.conf.retrieval == "netvlad":
            from mpsfm_tpu.extraction.retrieval import NetVLAD

            nv = NetVLAD(dict(self.conf.retrieval_conf))
            if nv.params is None:
                self.log("netvlad retrieval requested without weights; grid fallback", level=0)
            else:
                return np.stack(
                    [nv(io.read_image(self.scene_parser.image_path(n))) for n in names]
                )
        import cv2

        descs = []
        for name in names:
            img, _ = self._load_gray(name)
            d = cv2.resize(img, (16, 16)).reshape(-1)
            d = (d - d.mean()) / max(d.std(), 1e-6)
            descs.append(d)
        return np.stack(descs)

    # ---------- sky masks (reference extract_masks, base.py:345-354) ----------
    def extract_masks(self):
        """Per-image sky masks -> masks.h5 (True = valid/non-sky); skipped
        when the backend is 'none'. Cached like every other artifact
        ('k' in --extract forces recompute)."""
        if self.conf.masks == "none":
            return None
        import h5py

        names = self.scene_parser.image_names()
        path = self.paths["masks"]
        done = set(io.list_h5_names(path)) if path.exists() and "k" not in self.extract else set()
        todo = [n for n in names if n not in done]
        if not todo:
            return path
        from mpsfm_tpu.extraction.masks import SkyMask

        model = SkyMask({"backend": self.conf.masks, **dict(self.conf.mask_conf)})
        for name in todo:
            rgb = io.read_image(self.scene_parser.image_path(name))
            mask = model(rgb)
            with h5py.File(path, "a") as f:
                key = str(name)
                if key in f:
                    del f[key]
                f.create_dataset(key, data=mask.astype(bool), compression="gzip")
            self.log(f"mask {name}: {(~mask).mean():.1%} sky", level=2)
        return path

    def load_mask(self, name):
        """Valid-region (non-sky) mask for one image, or None."""
        if self.conf.masks == "none" or not self.paths["masks"].exists():
            return None
        import h5py

        with h5py.File(self.paths["masks"], "r") as f:
            key = str(name)
            if key not in f:
                return None
            return f[key][:]

    # ---------- features ----------
    def extract_features(self):
        names = self.scene_parser.image_names()
        path = self.paths["sfeats"]
        done = set(io.list_h5_names(path)) if path.exists() and "f" not in self.extract else set()
        todo = [n for n in names if n not in done]
        if not todo:
            return path
        model = self._get_feature_model()
        preds, scales = self._feature_preds(model, todo)
        for name, pred, scale in zip(todo, preds, scales):
            kps = (pred["keypoints"] + 0.5) / scale - 0.5
            io.write_features(
                path,
                name,
                kps,
                pred["descriptors"],
                pred["scores"],
                uncertainty=getattr(model, "detection_noise", 1.0) / scale,
                image_size=np.array(io.read_image(self.scene_parser.image_path(name), True).shape[::-1]),
            )
            self.log(f"features {name}: {len(kps)} kps", level=2)
        return path

    def _feature_preds(self, model, names):
        """Per-image detections; when the model exposes a batchable
        forward, all images run as mesh-sharded shape-bucketed batches
        (parallel.sharded_inference — the DataParallel equivalent of
        SURVEY.md §2.2), else a plain per-image loop."""
        loaded = [self._load_gray(n) for n in names]
        scales = [s for _, s in loaded]
        if self.conf.sharded_inference and hasattr(model, "batch_fn") and len(names) > 1:
            from mpsfm_tpu.parallel.sharded_inference import run_sharded_batches

            outs = run_sharded_batches(model.batch_fn(), [im for im, _ in loaded], lambda x: x)
            return [model.postprocess(o) for o in outs], scales
        return [model(im) for im, _ in loaded], scales

    # ---------- matches ----------
    def extract_matches(self, pairs):
        path = self.paths["smatches"]
        existing = set()
        if path.exists() and "m" not in self.extract:
            import h5py

            with h5py.File(path, "r") as f:
                # pair keys are "name0/name1" -> NESTED h5 groups;
                # root .keys() alone would miss them and re-match every run
                existing = {
                    f"{a}/{b}"
                    for a in f.keys()
                    if isinstance(f[a], h5py.Group)
                    for b in f[a].keys()
                }
        matcher = self._get_matcher()
        feats = {}

        def feat(name):
            if name not in feats:
                kps = io.get_keypoints(self.paths["sfeats"], name)
                desc = io.get_descriptors(self.paths["sfeats"], name)
                feats[name] = (kps, desc)
            return feats[name]

        from mpsfm_tpu.utils.workqueue import WorkQueue

        writer = WorkQueue(
            lambda item: io.write_matches(path, item[0], item[1], item[2], item[3])
        )
        todo = [p for p in pairs if io.names_to_pair(*p) not in existing]
        if isinstance(matcher, LightGlue):
            # image-major batched path: each image's features upload ONCE
            # into a device table and pair chunks gather by index inside
            # jit (match_pairs' per-pair operand assembly re-uploaded each
            # image's descriptors for every one of its ~12 retrieval
            # pairs — a 24x-redundant payload through the tunnel)
            sizes = {}

            def size(name):
                if name not in sizes:
                    sizes[name] = io.read_image(self.scene_parser.image_path(name), True).shape[::-1]
                return sizes[name]

            names = sorted({n for p in todo for n in p})
            idx_of = {n: i for i, n in enumerate(names)}
            outs = matcher.match_pairs_from_table(
                [feat(n) for n in names],
                [size(n) for n in names],
                [(idx_of[a], idx_of[b]) for a, b in todo],
            )
            for (name0, name1), out in zip(todo, outs):
                writer.put((name0, name1, out["matches0"], out["matching_scores0"]))
                self.log(f"matches {name0}-{name1}: {(out['matches0'] >= 0).sum()}", level=2)
        else:
            for name0, name1 in todo:
                kps0, desc0 = feat(name0)
                kps1, desc1 = feat(name1)
                out = matcher(desc0, desc1)
                writer.put((name0, name1, out["matches0"], out["matching_scores0"]))
                self.log(f"matches {name0}-{name1}: {(out['matches0'] >= 0).sum()}", level=2)
        writer.join()
        return path

    # ---------- dense matches (reference match_dense_2view.py) ----------
    def extract_dense_matches(self, pairs):
        """Per-pair dense matching; writes keypoints of both images + the
        match certainties into the dense cache (dfeats/dmatches streams of
        the reference collapsed into one file keyed by pair)."""
        import h5py

        path = self.paths["dpairs"]
        existing = set()
        if path.exists() and "m" not in self.extract:
            with h5py.File(path, "r") as f:
                # pair keys are "name0/name1" -> NESTED h5 groups;
                # root .keys() alone would miss them and re-match every run
                existing = {
                    f"{a}/{b}"
                    for a in f.keys()
                    if isinstance(f[a], h5py.Group)
                    for b in f[a].keys()
                }
        matcher = get_dense_matcher(self.conf.dense_matcher, dict(self.conf.dense_matcher_conf))
        for name0, name1 in pairs:
            key = io.names_to_pair(name0, name1)
            if key in existing:
                continue
            g0, s0 = self._load_gray(name0)
            g1, s1 = self._load_gray(name1)
            out = matcher(g0, g1)
            path.parent.mkdir(parents=True, exist_ok=True)
            with h5py.File(path, "a") as f:
                if key in f:
                    del f[key]
                grp = f.create_group(key)
                grp.create_dataset("keypoints0", data=(out["keypoints0"] + 0.5) / s0 - 0.5)
                grp.create_dataset("keypoints1", data=(out["keypoints1"] + 0.5) / s1 - 0.5)
                grp.create_dataset("certainty", data=out["certainty"])
            self.log(f"dense {name0}-{name1}: {len(out['certainty'])}", level=2)
        return path

    def extract_matches_dense_anchored(self, pairs):
        """RoMa-sparse mode: dense flow assigned to detected sparse
        keypoints (<=2px), written as a regular sparse match stream."""
        from mpsfm_tpu.extraction.matchers.dense_ncc import assign_flow_to_keypoints

        self.extract_dense_matches(pairs)
        path = self.cache_dir / f"matches-{self.conf.dense_matcher}-anchored.h5"
        import h5py

        existing = set()
        if path.exists() and "m" not in self.extract:
            with h5py.File(path, "r") as f:
                # pair keys are "name0/name1" -> NESTED h5 groups;
                # root .keys() alone would miss them and re-match every run
                existing = {
                    f"{a}/{b}"
                    for a in f.keys()
                    if isinstance(f[a], h5py.Group)
                    for b in f[a].keys()
                }
        for name0, name1 in pairs:
            if io.names_to_pair(name0, name1) in existing:
                continue
            k0, k1, cert = self.load_dense_pair(name0, name1)
            kpsA = io.get_keypoints(self.paths["sfeats"], name0)
            kpsB = io.get_keypoints(self.paths["sfeats"], name1)
            out = assign_flow_to_keypoints(k0, k1 - k0, cert, kpsA, kpsB)
            io.write_matches(path, name0, name1, out["matches0"], out["matching_scores0"])
        self.paths["smatches"] = path
        return path

    def extract_pair_depths(self, pairs):
        """'depth' matching mode: per-pair two-view depth maps with
        confidence-derived variance (reference match_dense_2view.py:191-199
        + mast3r.py:303-315, variance = (1/conf)²; the scene-level
        consumer picks the best-confidence pair per image).

        Backend: a two-view depth predictor (a MASt3R port when weights
        are available); the built-in 'measured' backend injects sensor
        depth at pair granularity (fork parity at the pair level)."""
        import h5py

        path = self.paths["pair_depth"]
        existing = set()
        if path.exists() and "d" not in self.extract:
            with h5py.File(path, "r") as f:
                existing = {k2 for k in f.keys() for k2 in (k,)}
        # prefer the dense matcher's OWN per-pair depth (MASt3R pointmap z
        # + (1/conf)² variance — exactly the reference's depth stream);
        # lazily instantiated so measured-RGB-D scenes never build it
        pair_depth_model = [None]

        def get_pair_depth_model():
            if pair_depth_model[0] is None:
                m = get_dense_matcher(
                    self.conf.dense_matcher, dict(self.conf.dense_matcher_conf)
                )
                pair_depth_model[0] = m if hasattr(m, "pair_depth") else False
            return pair_depth_model[0]

        for name0, name1 in pairs:
            key = io.names_to_pair(name0, name1)
            if key in existing:
                continue
            kw0 = self.scene_parser.prior_inputs(name0)
            if kw0.get("depth_measured") is None and get_pair_depth_model():
                imgs = [io.read_image(self.scene_parser.image_path(n)) for n in (name0, name1)]
                res = pair_depth_model[0].pair_depth(*imgs)
                io.write_pair_mono_map(path, name0, name1, {
                    name0: {"depth": np.asarray(res["0"]["depth"], np.float32),
                            "valid": res["0"]["valid"],
                            "variance": np.asarray(res["0"]["variance"], np.float32)},
                    name1: {"depth": np.asarray(res["1"]["depth"], np.float32),
                            "valid": res["1"]["valid"],
                            "variance": np.asarray(res["1"]["variance"], np.float32)},
                })
                self.log(f"pair depth (two-view) {name0}-{name1}", level=2)
                continue
            per_image = {}
            for name in (name0, name1):
                kw = self.scene_parser.prior_inputs(name)
                depth = kw.get("depth_measured")
                if depth is None:
                    out = None
                    if self.depth_backend is None:
                        self.depth_backend = get_prior_backend(self.conf.depth, dict(self.conf.depth_conf))
                    try:
                        out = self.depth_backend(io.read_image(self.scene_parser.image_path(name)), **kw)
                    except Exception:
                        out = None
                    if out is None:
                        continue
                    depth = out["depth"]
                depth = np.asarray(depth, np.float32)
                valid = depth > 0
                # stand-in confidence: fixed 1% relative uncertainty (the
                # fork's measured-depth calibration); a neural two-view
                # backend supplies (1/conf)² instead.
                variance = np.square(0.01 * np.maximum(depth, 1e-6))
                variance[~valid] = 1e6
                per_image[name] = {"depth": depth, "valid": valid, "variance": variance}
            if per_image:
                io.write_pair_mono_map(path, name0, name1, per_image)
                self.log(f"pair depth {name0}-{name1}", level=2)
        return path

    def load_mono_from_pairs(self, name, pairs):
        """Best-confidence per-pair depth for one image (reference
        utils/io.py:17-42)."""
        if not self.paths["pair_depth"].exists():
            return None
        return io.get_mono_map_from_pairs(self.paths["pair_depth"], name, pairs)

    def load_dense_pair(self, name0, name1):
        import h5py

        with h5py.File(self.paths["dpairs"], "r") as f:
            key = io.names_to_pair(name0, name1)
            rev = False
            if key not in f:
                key = io.names_to_pair(name1, name0)
                rev = True
            g = f[key]
            k0 = g["keypoints0"][:]
            k1 = g["keypoints1"][:]
            c = g["certainty"][:]
        return (k1, k0, c) if rev else (k0, k1, c)

    # ---------- monocular priors ----------
    def extract_mono(self):
        names = self.scene_parser.image_names()
        dpath = self.paths["depth"]
        done = set()
        if dpath.exists() and "d" not in self.extract:
            import h5py

            with h5py.File(dpath, "r") as f:
                done = set(f.keys())
        todo = [n for n in names if str(Path(n).name) not in done]
        if not todo:
            return dpath
        if self.depth_backend is None:
            self.depth_backend = get_prior_backend(self.conf.depth, dict(self.conf.depth_conf))
        normals_backend = None
        if self.conf.normals not in (None, "", "from_depth"):
            # dedicated normals model (reference: DSINE runs separately
            # from the depth model, extraction/base.py mono loop)
            normals_backend = get_prior_backend(
                self.conf.normals, dict(self.conf.normals_conf)
            )
        for name in todo:
            rgb = io.read_image(self.scene_parser.image_path(name))
            kw = self.scene_parser.prior_inputs(name)
            out = self.depth_backend(rgb, **kw)
            if normals_backend is not None:
                try:
                    nout = normals_backend(rgb, **kw)
                    out.update(nout)
                except RuntimeError:
                    pass  # no weights in this environment: keep depth-derived
            if "normals" not in out and "intrinsics" in kw:
                fx, fy, cx, cy = kw["intrinsics"]
                out["normals"] = normals_from_depth(out["depth"], fx, fy, cx, cy)
                out["normals_variance"] = np.full(out["depth"].shape, (np.deg2rad(5.0)) ** 2)
            io.write_mono_map(dpath, name, out)
        return dpath

    def use_measured(self):
        """Fork parity: overwrite the depth cache with sensor depth at 1%
        relative uncertainty (tauzn-clock extraction/base.py:177-224)."""
        self.conf["depth"] = "measured"
        self.depth_backend = get_prior_backend("measured", dict(self.conf.depth_conf))
        self.extract.add("d")
        self.paths["depth"] = self.cache_dir / "depth-measured.h5"
        return self.extract_mono()

    # ---------- load for the mapper ----------
    def load_correspondence_inputs(self, pairs):
        """Per-image keypoints + per-pair matches. In dense modes, dense
        grid keypoints are appended after the sparse set with index
        offsets (reference gather_dense_2view,
        scene/correspondences/utils.py:101-173)."""
        mode = self.conf.matches_mode
        use_sparse = "sparse" in mode
        use_dense = "dense" in mode
        keypoints = {}
        if use_sparse:
            for name in self.scene_parser.image_names():
                keypoints[name] = io.get_keypoints(self.paths["sfeats"], name)
        else:
            for name in self.scene_parser.image_names():
                keypoints[name] = np.zeros((0, 2))
        matches, scores = {}, {}
        if use_sparse:
            for name0, name1 in pairs:
                m, s = io.get_matches(self.paths["smatches"], name0, name1)
                matches[(name0, name1)] = m
                scores[frozenset((name0, name1))] = s
        if use_dense:
            for name0, name1 in pairs:
                k0, k1, cert = self.load_dense_pair(name0, name1)
                off0 = len(keypoints[name0])
                off1 = len(keypoints[name1])
                keypoints[name0] = np.concatenate([keypoints[name0], k0])
                keypoints[name1] = np.concatenate([keypoints[name1], k1])
                dm = np.stack(
                    [off0 + np.arange(len(k0)), off1 + np.arange(len(k1))], -1
                ).astype(np.int64)
                if (name0, name1) in matches:
                    matches[(name0, name1)] = np.concatenate([matches[(name0, name1)], dm])
                    scores[frozenset((name0, name1))] = np.concatenate(
                        [scores[frozenset((name0, name1))], cert]
                    )
                else:
                    matches[(name0, name1)] = dm
                    scores[frozenset((name0, name1))] = cert
        return keypoints, matches, scores

    def load_mono(self, name):
        return io.get_mono_map(self.paths["depth"], name)
