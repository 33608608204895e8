"""COLMAP text-format reconstruction writer/reader.

Matches the reference's output format (MpsfmReconstruction.write writes a
COLMAP-format reconstruction + gzip'd depths.h5 — reference
scene/reconstruction/base.py:123-141) so downstream COLMAP tooling and
parity checks work on our outputs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mpsfm_tpu.scene.reconstruction import HostCamera, ImageRecord, Pose, Reconstruction


def write_text(rec: Reconstruction, out_dir):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    with open(out / "cameras.txt", "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for cid, cam in sorted(rec.cameras.items()):
            params = " ".join(f"{p:.12g}" for p in cam.params[:4])
            f.write(f"{cid} PINHOLE {cam.width} {cam.height} {params}\n")

    with open(out / "images.txt", "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        for imid, im in sorted(rec.images.items()):
            if not im.registered:
                continue
            q = im.pose.q
            t = im.pose.t
            f.write(
                f"{imid + 1} {q[0]:.12g} {q[1]:.12g} {q[2]:.12g} {q[3]:.12g} "
                f"{t[0]:.12g} {t[1]:.12g} {t[2]:.12g} {im.camera_id} {im.name}\n"
            )
            obs = []
            for kp in range(len(im.keypoints)):
                pid = im.point3D_ids[kp]
                obs.append(
                    f"{im.keypoints[kp, 0]:.6g} {im.keypoints[kp, 1]:.6g} "
                    f"{pid + 1 if pid >= 0 else -1}"
                )
            f.write(" ".join(obs) + "\n")

    with open(out / "points3D.txt", "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        f.write("#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as (IMAGE_ID, POINT2D_IDX)\n")
        (o_pid, o_im, o_kp), err = rec._point_reproj_errors(rec.point_ids())
        err_of = {}
        for pid in rec.point_ids():
            sel = o_pid == pid
            err_of[pid] = float(np.sqrt(np.clip(err[sel], 0, 1e12)).mean()) if sel.any() else 0.0
        for pid in rec.point_ids():
            xyz = rec.xyz[pid]
            track = " ".join(f"{imid + 1} {kp}" for imid, kp in rec.tracks[pid])
            f.write(
                f"{pid + 1} {xyz[0]:.12g} {xyz[1]:.12g} {xyz[2]:.12g} "
                f"128 128 128 {err_of[pid]:.6g} {track}\n"
            )


def write_depths(rec: Reconstruction, path):
    """gzip'd depths.h5 with refined + prior depth, masks, scales
    (reference scene/reconstruction/base.py:123-141)."""
    import h5py

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        for imid, im in rec.images.items():
            d = getattr(im, "depth", None)
            if d is None:
                continue
            grp = f.create_group(im.name)
            kw = dict(compression="gzip", compression_opts=4)
            if d.activated and d.data is not None:
                grp.create_dataset("depth", data=np.asarray(d.data, np.float32), **kw)
            grp.create_dataset("prior_depth", data=np.asarray(d.data_prior, np.float32), **kw)
            grp.create_dataset("uncertainty", data=np.asarray(d.uncertainty, np.float32), **kw)
            grp.create_dataset("valid", data=np.asarray(d.valid), **kw)
            if d.continuity_mask is not None:
                grp.create_dataset("continuity", data=np.asarray(d.continuity_mask), **kw)
            grp.attrs["scale"] = d.scale
            grp.attrs["shift"] = d.shift


def read_text(in_dir) -> Reconstruction:
    """Load a COLMAP text reconstruction (for --refrec ATE comparisons)."""
    in_dir = Path(in_dir)
    rec = Reconstruction()
    with open(in_dir / "cameras.txt") as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cid = int(parts[0])
            W, H = int(parts[2]), int(parts[3])
            params = np.asarray([float(x) for x in parts[4:8]])
            if parts[1] == "SIMPLE_PINHOLE":
                params = np.asarray([float(parts[4])] * 2 + [float(parts[5]), float(parts[6])])
            rec.add_camera(HostCamera(cid, params, W, H))
    with open(in_dir / "images.txt") as f:
        lines = [l for l in f if not l.startswith("#") and l.strip()]
    obs_lines = {}
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        imid = int(parts[0]) - 1
        q = np.asarray([float(x) for x in parts[1:5]])
        t = np.asarray([float(x) for x in parts[5:8]])
        im = ImageRecord(imid, parts[9], int(parts[8]))
        im.pose = Pose(q, t)
        im.registered = True
        obs = lines[i + 1].split()
        n_kp = len(obs) // 3
        im.keypoints = np.array(
            [[float(obs[3 * k]), float(obs[3 * k + 1])] for k in range(n_kp)]
        ).reshape(n_kp, 2)
        im.point3D_ids = np.full(n_kp, -1, np.int64)
        rec.add_image(im)
    pts_path = in_dir / "points3D.txt"
    if pts_path.exists():
        with open(pts_path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                parts = line.split()
                xyz = [float(x) for x in parts[1:4]]
                track = []
                for k in range(8, len(parts), 2):
                    track.append((int(parts[k]) - 1, int(parts[k + 1])))
                rec.add_point3D(np.asarray(xyz), track)
    return rec
