"""Dataset loaders: Blender (transforms json), LLFF (poses_bounds + NDC),
NSVF (intrinsics/pose dirs + bbox.txt), and a procedural synthetic scene for
tests/benchmarks.

Parity: nerf_sh/nerf/datasets.py (threaded prefetch, ray layout, split
handling) unified with octree/nerf/datasets.py (bbox exposure) — ONE loader
stack serves both training and octree conversion. Batches leave this module
as host numpy; device placement/sharding is the trainer's job
(plenoctree_tpu.parallel), keeping loaders backend-agnostic.
"""

import json
import os
import queue
import threading
from os import path

import numpy as np
from PIL import Image

from plenoctree_tpu.data import poses as pose_utils
from plenoctree_tpu.data.rays import convert_to_ndc, generate_rays
from plenoctree_tpu.types import Rays, namedtuple_map


def get_dataset(split, args, prefetch=True):
    return dataset_dict[args.dataset](split, args, prefetch=prefetch)


def _resize_area(image, new_w, new_h):
    """Area-averaging resize (cv2.INTER_AREA equivalent)."""
    import cv2

    return cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_AREA)


class Dataset:
    """Base dataset: loads renderings, generates rays, serves batches.

    A background thread keeps a depth-3 queue of ready batches so host-side
    batch assembly overlaps device steps (parity: Dataset(threading.Thread),
    nerf_sh/nerf/datasets.py:63-118; here composition instead of inheritance
    and the option to disable the thread for deterministic tests).
    """

    def __init__(self, split, args, prefetch=True):
        self.split = split
        if split == "train":
            self._train_init(args)
        elif split in ("test", "val"):
            self._test_init(args)
        else:
            raise ValueError(f"split must be train/val/test, got {split}")
        n_hosts = 1
        try:
            import jax

            n_hosts = jax.process_count()
        except Exception:
            pass
        self.batch_size = args.batch_size // n_hosts
        self.image_batching = args.image_batching
        self.render_path = args.render_path
        self._rng = np.random.default_rng()
        self._queue = None
        if prefetch:
            self._queue = queue.Queue(3)
            self._thread = threading.Thread(target=self._fill_queue, daemon=True)
            self._thread.start()

    # -- iteration ---------------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self):
        held = getattr(self, "_requeue", None)
        if held:
            return held.pop(0)
        if self._queue is not None:
            return self._queue.get()
        return self._next()

    def peek(self):
        """Return the batch the next __next__ will yield, without consuming
        it. Repeated peeks return the SAME batch (reference queue-front
        semantics — reference nerf_sh/nerf/datasets.py peek): the held
        batch lives at the front of _requeue until __next__ drains it."""
        held = getattr(self, "_requeue", None)
        if held:
            item = held[0]
        else:
            # Blocking get + hold (no busy-wait); safe because this
            # dataset has a single consumer thread.
            item = self._queue.get() if self._queue is not None else self._next()
            self._requeue = getattr(self, "_requeue", [])
            self._requeue.append(item)
        return {k: v for k, v in item.items()}

    def _fill_queue(self):
        while True:
            self._queue.put(self._next())

    def _next(self):
        return self._next_train() if self.split == "train" else self._next_test()

    @property
    def size(self):
        return self.n_examples

    def __len__(self):
        return self.size

    # -- split setup --------------------------------------------------------
    def _train_init(self, args):
        self._load_renderings(args)
        self._generate_rays()
        if args.image_batching:
            self.images = self.images.reshape([-1, 3])
            self.rays = namedtuple_map(
                lambda r: r.reshape([-1, r.shape[-1]]), self.rays
            )
        else:
            self.images = self.images.reshape([-1, self.resolution, 3])
            self.rays = namedtuple_map(
                lambda r: r.reshape([-1, self.resolution, r.shape[-1]]), self.rays
            )

    def _test_init(self, args):
        self._load_renderings(args)
        self._generate_rays()
        self.it = 0

    def _next_train(self):
        if self.image_batching:
            idx = self._rng.integers(0, self.rays[0].shape[0], (self.batch_size,))
            pixels = self.images[idx]
            rays = namedtuple_map(lambda r: r[idx], self.rays)
        else:
            img = self._rng.integers(0, self.n_examples)
            idx = self._rng.integers(0, self.rays[0][0].shape[0], (self.batch_size,))
            pixels = self.images[img][idx]
            rays = namedtuple_map(lambda r: r[img][idx], self.rays)
        return {"pixels": pixels, "rays": rays}

    def _next_test(self):
        idx = self.it
        self.it = (self.it + 1) % self.n_examples
        if self.render_path:
            return {"rays": namedtuple_map(lambda r: r[idx], self.render_rays)}
        return {
            "pixels": self.images[idx],
            "rays": namedtuple_map(lambda r: r[idx], self.rays),
        }

    def _generate_rays(self):
        self.rays = generate_rays(self.w, self.h, self.focal, self.camtoworlds)

    # bbox (NSVF bbox.txt), None elsewhere — used by octree extraction's
    # --bbox_from_data (octree/extraction.py:455-459).
    bbox = None


def _load_image(fname):
    with open(fname, "rb") as f:
        return np.array(Image.open(f), dtype=np.float32) / 255.0


def _composite_white(image, white_bkgd):
    if image.shape[-1] == 4:
        if white_bkgd:
            return image[..., :3] * image[..., -1:] + (1.0 - image[..., -1:])
        return image[..., :3]
    return image[..., :3]


class Blender(Dataset):
    """NeRF-synthetic: transforms_{split}.json + per-frame PNGs."""

    def _load_renderings(self, args):
        if args.render_path:
            raise ValueError("render_path cannot be used for the blender dataset.")
        with open(
            path.join(args.data_dir, f"transforms_{self.split}.json"), "r"
        ) as fp:
            meta = json.load(fp)
        images, cams = [], []
        for frame in meta["frames"]:
            fname = os.path.join(args.data_dir, frame["file_path"] + ".png")
            image = _load_image(fname)
            if args.factor == 2:
                image = _resize_area(image, image.shape[1] // 2, image.shape[0] // 2)
            elif args.factor > 0:
                raise ValueError(
                    f"Blender dataset only supports factor=0 or 2, {args.factor} set."
                )
            cams.append(frame["transform_matrix"])
            images.append(_composite_white(image, args.white_bkgd))
        self.images = np.stack(images, axis=0)
        self.h, self.w = self.images.shape[1:3]
        self.resolution = self.h * self.w
        self.camtoworlds = np.stack(cams, axis=0).astype(np.float32)
        self.focal = 0.5 * self.w / np.tan(0.5 * float(meta["camera_angle_x"]))
        self.n_examples = self.images.shape[0]


class LLFF(Dataset):
    """Real forward-facing / 360 captures: images_N/ + poses_bounds.npy."""

    def _load_renderings(self, args):
        data_dir = path.expanduser(args.data_dir)
        factor = args.factor if args.factor > 0 else 1
        imgdir = path.join(
            data_dir, "images" + (f"_{args.factor}" if args.factor > 0 else "")
        )
        if not path.exists(imgdir):
            raise ValueError(f"Image folder {imgdir} doesn't exist.")
        imgfiles = [
            path.join(imgdir, f)
            for f in sorted(os.listdir(imgdir))
            if f.lower().endswith(("jpg", "png"))
        ]
        images = np.stack([_load_image(f) for f in imgfiles], axis=-1)

        with open(path.join(data_dir, "poses_bounds.npy"), "rb") as fp:
            poses_arr = np.load(fp)
        poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
        bds = poses_arr[:, -2:].transpose([1, 0])
        if poses.shape[-1] != images.shape[-1]:
            raise RuntimeError(
                f"Mismatch between imgs {images.shape[-1]} and poses {poses.shape[-1]}"
            )

        # Correct intrinsics for downsampling.
        poses[:2, 4, :] = np.array(images.shape[:2]).reshape([2, 1])
        poses[2, 4, :] = poses[2, 4, :] / factor

        # [down, right, backwards] -> [right, up, backwards] axis flip.
        poses = np.concatenate(
            [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1
        )
        poses = np.moveaxis(poses, -1, 0).astype(np.float32)
        images = np.moveaxis(images, -1, 0)
        bds = np.moveaxis(bds, -1, 0).astype(np.float32)

        scale = 1.0 / (bds.min() * 0.75)
        poses[:, :3, 3] *= scale
        bds *= scale
        poses = pose_utils.recenter_poses(poses)

        if args.spherify:
            poses, render_poses, bds = pose_utils.spherify_poses(
                poses, bds, make_render_path=self.split == "test"
            )
            if render_poses is not None:
                self.render_poses = render_poses
            self.spherify = True
        else:
            self.spherify = False
        if not args.spherify and self.split == "test":
            self.render_poses = pose_utils.spiral_path(poses, bds)

        i_test = np.arange(images.shape[0])[:: args.llffhold]
        indices = (
            i_test
            if self.split != "train"
            else np.array([i for i in np.arange(images.shape[0]) if i not in i_test])
        )
        images = images[indices]
        poses = poses[indices]

        self.images = images
        self.camtoworlds = poses[:, :3, :4]
        self.focal = poses[0, -1, -1]
        self.h, self.w = images.shape[1:3]
        self.resolution = self.h * self.w
        self.n_examples = (
            self.render_poses.shape[0] if args.render_path else images.shape[0]
        )

    def _generate_rays(self):
        """NDC rays for forward-facing captures; also rays for render path."""
        if self.split == "test":
            n_render_poses = self.render_poses.shape[0]
            self.camtoworlds = np.concatenate(
                [self.render_poses, self.camtoworlds], axis=0
            )
        super()._generate_rays()
        if not self.spherify:
            ndc_o, ndc_d = convert_to_ndc(
                self.rays.origins, self.rays.directions, self.focal, self.w, self.h
            )
            self.rays = Rays(
                origins=ndc_o.astype(np.float32),
                directions=ndc_d.astype(np.float32),
                viewdirs=self.rays.viewdirs,
            )
        if self.split == "test":
            self.camtoworlds = self.camtoworlds[n_render_poses:]
            split = [np.split(r, [n_render_poses], 0) for r in self.rays]
            split0, split1 = zip(*split)
            self.render_rays = Rays(*split0)
            self.rays = Rays(*split1)


class NSVF(Dataset):
    """NSVF format: intrinsics.txt + pose/ + rgb/ (+ optional bbox.txt)."""

    def _load_renderings(self, args):
        if args.render_path:
            raise ValueError("render_path cannot be used for the NSVF dataset.")
        data_dir = path.expanduser(args.data_dir)
        K = np.loadtxt(path.join(data_dir, "intrinsics.txt"))
        pose_files = sorted(os.listdir(path.join(data_dir, "pose")))
        img_files = sorted(os.listdir(path.join(data_dir, "rgb")))

        if self.split == "train":
            pose_files = [x for x in pose_files if x.startswith("0_")]
            img_files = [x for x in img_files if x.startswith("0_")]
        elif self.split == "val":
            pose_files = [x for x in pose_files if x.startswith("1_")]
            img_files = [x for x in img_files if x.startswith("1_")]
        else:  # test: prefer 2_, fall back to 1_
            tp = [x for x in pose_files if x.startswith("2_")]
            ti = [x for x in img_files if x.startswith("2_")]
            if not tp:
                tp = [x for x in pose_files if x.startswith("1_")]
                ti = [x for x in img_files if x.startswith("1_")]
            pose_files, img_files = tp, ti

        assert len(img_files) == len(pose_files)
        cam_trans = np.diag(np.array([1, -1, -1, 1], dtype=np.float32))
        images, cams = [], []
        for img_fname, pose_fname in zip(img_files, pose_files):
            image = _load_image(path.join(data_dir, "rgb", img_fname))
            cams.append(
                np.loadtxt(path.join(data_dir, "pose", pose_fname)) @ cam_trans
            )
            image = _composite_white(image, args.white_bkgd)
            if args.factor > 1:
                image = _resize_area(
                    image, image.shape[1] // args.factor, image.shape[0] // args.factor
                )
            images.append(image)
        self.images = np.stack(images, axis=0)
        self.n_examples, self.h, self.w = self.images.shape[:3]
        self.resolution = self.h * self.w
        self.camtoworlds = np.stack(cams, axis=0).astype(np.float32)
        self.focal = (K[0, 0] + K[1, 1]) * 0.5
        if args.factor > 1:
            self.focal /= args.factor

        bbox_path = path.join(data_dir, "bbox.txt")
        if path.exists(bbox_path):
            self.bbox = np.loadtxt(bbox_path).reshape(-1)[:7].astype(np.float32)


class Synthetic(Dataset):
    """Procedural analytic scene rendered at init — no disk data needed.

    Used by tests and bench.py: images are produced by densely integrating an
    analytic density/color field with the same compositing math the model
    uses, so a correct trainer must drive PSNR up on it.
    """

    def _load_renderings(self, args):
        from plenoctree_tpu.data.synthetic import render_synthetic_scene

        n_views = 12 if self.split == "train" else 4
        res = getattr(args, "synthetic_resolution", 64)
        images, camtoworlds, focal = render_synthetic_scene(
            split=self.split,
            n_views=n_views,
            resolution=res,
            white_bkgd=args.white_bkgd,
            near=args.near,
            far=args.far,
        )
        self.images = images
        self.camtoworlds = camtoworlds
        self.focal = focal
        self.h, self.w = images.shape[1:3]
        self.resolution = self.h * self.w
        self.n_examples = images.shape[0]


dataset_dict = {
    "blender": Blender,
    "llff": LLFF,
    "nsvf": NSVF,
    "synthetic": Synthetic,
}
