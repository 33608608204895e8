"""Synthetic plane-scene generator for end-to-end mapper tests.

Builds a fully analytic scene (tilted plane heightfield), renders exact
depth/normal priors (+ controllable noise and scale corruption), projects
GT keypoints with pixel noise and outlier matches — everything the mapper
consumes, with known ground truth for ATE checks.
"""

from __future__ import annotations

import numpy as np

from mpsfm_tpu.scene.image_priors import ImagePriors
from mpsfm_tpu.scene.reconstruction import HostCamera, ImageRecord, Pose, Reconstruction


def _quat_mul_np(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _rotvec_quat(v):
    th = np.linalg.norm(v)
    if th < 1e-12:
        return np.array([1.0, 0, 0, 0])
    ax = v / th
    return np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * ax])


class PlaneScene:
    """Tilted plane n·p = n_z*d0 observed by cameras near the origin.

    With ``wedge=True`` a second plane forms a corner (depth = min over
    planes along each ray): non-planar structure that keeps essential-
    matrix estimation well-posed and adds a depth discontinuity."""

    def __init__(
        self,
        n_images=8,
        n_points=400,
        img_wh=(160, 120),
        focal=200.0,
        plane_normal=(0.25, -0.15),
        d0=5.0,
        baseline=0.35,
        point_jitter=0.0,
        wedge=False,
        wedge_normal=(-0.45, 0.1),
        wedge_d0=3.6,
        rng=None,
    ):
        self.rng = rng or np.random.default_rng(0)
        self.W, self.H = img_wh
        self.focal = focal
        n = np.array([plane_normal[0], plane_normal[1], -1.0])
        self.n = n / np.linalg.norm(n)
        self.d0 = d0
        self.wedge = wedge
        if wedge:
            n2 = np.array([wedge_normal[0], wedge_normal[1], -1.0])
            self.n2 = n2 / np.linalg.norm(n2)
            self.d02 = wedge_d0
        self.poses = []
        for i in range(n_images):
            q = _rotvec_quat(np.array([0.01, 0.015, 0.005]) * i)
            t = np.array([-baseline * i, 0.03 * i, 0.02 * i])
            self.poses.append(Pose(q, t))
        # GT points on the surface, visible from camera 0
        u = self.rng.uniform(-0.55, 0.55, n_points)
        v = self.rng.uniform(-0.45, 0.45, n_points)
        z = self._ray_depth(u, v)
        self.points = np.stack([u * z, v * z, z], -1)
        if point_jitter:
            # off-plane structure: keeps essential-matrix init well-posed
            # (a pure plane degenerates E; H-decomposition init is a TODO)
            self.points = self.points + self.rng.normal(scale=point_jitter, size=self.points.shape)

    def _ray_depth(self, u, v, pose: "Pose | None" = None):
        """Depth(s) along normalized rays (u, v, 1); camera-0 frame when
        pose is None, else that camera's frame (min over wedge planes)."""
        if pose is None:
            r_world = np.stack([u, v, np.ones_like(u)], -1)
            c = np.zeros(3)
        else:
            Rt = pose.rotation_matrix().T
            r_world = np.einsum("ij,...j->...i", Rt, np.stack([u, v, np.ones_like(u)], -1))
            c = pose.center()
        planes = [(self.n, self.d0)]
        if self.wedge:
            planes.append((self.n2, self.d02))
        best = np.full(u.shape, np.inf)
        for n, d0 in planes:
            denom = np.einsum("i,...i->...", n, r_world)
            s = (n[2] * d0 - n @ c) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            s = np.where(s > 0.05, s, np.inf)
            best = np.minimum(best, s)
        return np.where(np.isfinite(best), best, 0.1)

    def plane_depth(self, pose: Pose, W=None, H=None, fx=None):
        """Exact depth map of the surface in a camera (min over planes)."""
        W = W or self.W
        H = H or self.H
        f = fx or self.focal
        xx, yy = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        u = (xx - W / 2) / f
        v = (yy - H / 2) / f
        return np.clip(self._ray_depth(u, v, pose), 0.1, None)

    def cam_normals(self, pose: Pose, W=None, H=None):
        W = W or self.W
        H = H or self.H
        f = self.focal
        R = pose.rotation_matrix()
        if not self.wedge:
            n_cam = R @ self.n
            return np.broadcast_to(n_cam, (H, W, 3)).copy()
        # per-pixel: which plane won the min-depth race
        xx, yy = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        u = (xx - W / 2) / f
        v = (yy - H / 2) / f
        Rt = R.T
        r_world = np.einsum("ij,hwj->hwi", Rt, np.stack([u, v, np.ones_like(u)], -1))
        c = pose.center()
        depths = []
        for n, d0 in ((self.n, self.d0), (self.n2, self.d02)):
            denom = np.einsum("i,hwi->hw", n, r_world)
            s = (n[2] * d0 - n @ c) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            depths.append(np.where(s > 0.05, s, np.inf))
        pick2 = depths[1] < depths[0]
        n1c = R @ self.n
        n2c = R @ self.n2
        out = np.where(pick2[..., None], n2c[None, None], n1c[None, None])
        return out.copy()

    def build(
        self,
        kp_noise=0.4,
        outlier_frac=0.1,
        depth_noise=0.02,
        depth_scale_err_range=(0.9, 1.1),
        with_priors=True,
        priors_conf=None,
        visibility=0.9,
        normals_noise_deg=3.0,
    ):
        """Returns (rec, keypoints dict, matches dict, gt)."""
        rng = self.rng
        rec = Reconstruction()
        cam = HostCamera(
            1, np.array([self.focal, self.focal, self.W / 2, self.H / 2]), self.W, self.H
        )
        cam.int_width, cam.int_height = self.W, self.H  # grid == image here
        rec.add_camera(cam)

        keypoints = {}
        kp_of_point = {}  # (imid, point idx) -> kp idx
        for i, pose in enumerate(self.poses):
            name = f"im{i}.jpg"
            im = ImageRecord(i, name, 1)
            p_cam = pose.transform(self.points)
            z = p_cam[:, 2]
            px = p_cam[:, :2] / z[:, None] * self.focal + np.array([self.W / 2, self.H / 2])
            vis = (
                (z > 0.1)
                & (px[:, 0] > 2)
                & (px[:, 0] < self.W - 2)
                & (px[:, 1] > 2)
                & (px[:, 1] < self.H - 2)
                & (rng.uniform(size=len(z)) < visibility)
            )
            if self.wedge:  # occlusion: point must be the closest surface
                dmap = self.plane_depth(pose)
                ui = np.clip(px[:, 0].astype(int), 0, self.W - 1)
                vi = np.clip(px[:, 1].astype(int), 0, self.H - 1)
                vis &= z <= dmap[vi, ui] * 1.02 + 0.02
            idxs = np.where(vis)[0]
            kps = px[idxs] + rng.normal(scale=kp_noise, size=(len(idxs), 2))
            keypoints[name] = kps
            for k_local, k_global in enumerate(idxs):
                kp_of_point[(i, int(k_global))] = k_local
            im.keypoints = kps
            im.point3D_ids = np.full(len(kps), -1, np.int64)
            rec.add_image(im)

        matches = {}
        for i in range(len(self.poses)):
            for j in range(i + 1, len(self.poses)):
                shared = [
                    p
                    for p in range(len(self.points))
                    if (i, p) in kp_of_point and (j, p) in kp_of_point
                ]
                if len(shared) < 16:
                    continue
                m = np.array(
                    [[kp_of_point[(i, p)], kp_of_point[(j, p)]] for p in shared], np.int64
                )
                n_out = int(outlier_frac * len(m))
                if n_out:
                    rows = rng.choice(len(m), n_out, replace=False)
                    m[rows, 1] = rng.integers(0, len(keypoints[f"im{j}.jpg"]), n_out)
                    m = np.unique(m, axis=0)
                matches[(f"im{i}.jpg", f"im{j}.jpg")] = m

        if with_priors:
            conf = priors_conf or {
                "depth": {"prior_uncertainty": False, "depth_uncertainty": 0.03},
                "cg_max_iter": 200,
                "max_iter": 4,
                "downscaled": True,
                "downscale_factor": 2,
            }
            for i, pose in enumerate(self.poses):
                scale_err = rng.uniform(*depth_scale_err_range)
                depth = self.plane_depth(pose) * scale_err
                if depth_noise:
                    depth = depth * np.exp(rng.normal(scale=depth_noise, size=depth.shape))
                normals = self.cam_normals(pose)
                normals_dict = {"normals": normals}
                if normals_noise_deg:
                    # honest priors: perturb the analytic normals with
                    # tangent-plane angular noise AND declare a matching
                    # variance — exact normals with the 1° default variance
                    # make the integration posterior collapse toward the
                    # (correlated-error-blind) level variance
                    rad = np.deg2rad(normals_noise_deg)
                    v = rng.normal(scale=rad, size=normals.shape)
                    v -= (v * normals).sum(-1, keepdims=True) * normals
                    n = normals + v
                    normals_dict["normals"] = n / np.clip(
                        np.linalg.norm(n, axis=-1, keepdims=True), 1e-12, None
                    )
                    normals_dict["normals_variance"] = np.full(normals.shape[:2], rad**2)
                pri = ImagePriors(
                    conf,
                    rec,
                    i,
                    depth_dict={"depth": depth},
                    normals_dict=normals_dict,
                )
                rec.images[i].priors = pri
                rec.images[i].depth = pri.depth
                rec.images[i].normals = pri.normals

        gt = {"poses": [Pose(p.q.copy(), p.t.copy()) for p in self.poses], "points": self.points}
        return rec, keypoints, matches, gt


def render_scene_dir(
    scene: "PlaneScene",
    out_dir,
    rng=None,
    texture_res=1024,
    depth_noise=0.0,
    plane_extent=8.0,
    write_depth=True,
    supersample=1,
):
    """Render the plane scene to disk as an RGB-D dataset consumable by the
    CLI pipeline: images/*.png, depth/*.npy (sensor depth), intrinsics.yaml.

    ``plane_extent`` is the world-units span the texture covers along the
    plane axes (wider trajectories need a wider carpet); the texture is a
    pure function of the world point, so two scenes sharing plane params
    and the same ``rng`` seed render the SAME scene from different poses
    (used by the trained-prior tests: a training pass and a disjoint
    low-overlap capture of one scene). ``write_depth=False`` renders an
    RGB-only capture (priors must then come from a model)."""
    import cv2
    import yaml
    from pathlib import Path

    rng = rng or np.random.default_rng(1)
    out = Path(out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    if write_depth:
        (out / "depth").mkdir(parents=True, exist_ok=True)

    # multi-octave fractal texture: distinctive local structure at every
    # scale, so descriptors are globally unique — random cross-view
    # matches then fail geometric verification instead of accumulating
    # chance-consistent inlier sets (which can win init-pair ranking)
    tex = np.zeros((texture_res, texture_res))
    for octv, wgt in enumerate((1.0, 0.7, 0.5, 0.35, 0.25)):
        res_o = max(8, texture_res >> (4 - octv))
        layer = rng.uniform(-1, 1, (res_o, res_o))
        tex += wgt * cv2.resize(layer, (texture_res, texture_res), interpolation=cv2.INTER_CUBIC)
    tex = cv2.GaussianBlur(tex, (3, 3), 0.6)
    tex = (tex - tex.min()) / (tex.max() - tex.min())

    # plane frame: origin at (0,0,?) on plane, axes e1,e2 orthogonal to n
    n = scene.n
    e1 = np.cross(n, [0, 0, 1.0])
    if np.linalg.norm(e1) < 1e-6:
        e1 = np.array([1.0, 0, 0])
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(n, e1)
    p0 = np.array([0, 0, scene.d0])  # on plane

    W, H = scene.W, scene.H
    f = scene.focal
    for i, pose in enumerate(scene.poses):
        # supersample > 1: render at ss x resolution and area-downsample —
        # proper antialiasing so fine texture stays view-consistent
        # (aliased detail decorrelates descriptors across views)
        ss = int(supersample)
        Ws, Hs, fs = W * ss, H * ss, f * ss
        depth = scene.plane_depth(pose, W=Ws, H=Hs, fx=fs)
        xx, yy = np.meshgrid(np.arange(Ws, dtype=np.float64), np.arange(Hs, dtype=np.float64))
        u = (xx - Ws / 2) / fs
        v = (yy - Hs / 2) / fs
        p_cam = np.stack([u * depth, v * depth, depth], -1)
        Rt = pose.rotation_matrix().T
        p_world = np.einsum("ij,hwj->hwi", Rt, p_cam - pose.t[None, None])
        rel = p_world - p0
        s = np.einsum("i,hwi->hw", e1, rel)
        t = np.einsum("i,hwi->hw", e2, rel)
        # plane extent ~ +/-plane_extent/2 units -> texture coords
        su = (s / plane_extent + 0.5) * (texture_res - 1)
        tv = (t / plane_extent + 0.5) * (texture_res - 1)
        img = cv2.remap(
            tex.astype(np.float32), su.astype(np.float32), tv.astype(np.float32),
            cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT,
        )
        if ss > 1:
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        cv2.imwrite(str(out / "images" / f"im{i:02d}.png"), (img * 255).astype(np.uint8))
        if write_depth:
            d = depth.copy() if ss == 1 else scene.plane_depth(pose)
            if depth_noise:
                d = d * np.exp(rng.normal(scale=depth_noise, size=d.shape))
            np.save(out / "depth" / f"im{i:02d}.npy", d)

    with open(out / "intrinsics.yaml", "w") as fh:
        yaml.safe_dump(
            {1: {"params": [float(f), float(f), W / 2, H / 2], "images": "all"}}, fh
        )
    return out


def umeyama_alignment(src, dst):
    """Similarity (s,R,t) minimizing ||dst - (s R src + t)||."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc**2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / var_s
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(rec: Reconstruction, gt_poses):
    """ATE RMSE of registered camera centers after similarity alignment."""
    est, gt = [], []
    for imid in rec.reg_image_ids():
        est.append(rec.images[imid].pose.center())
        gt.append(gt_poses[imid].center())
    est = np.stack(est)
    gt = np.stack(gt)
    s, R, t = umeyama_alignment(est, gt)
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean()))
