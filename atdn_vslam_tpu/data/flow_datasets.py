"""Flow-training datasets + augmentation.

Parity with the GMA wheel's training data layer (ref: GMA/core/
datasets.py:18-281 — FlyingChairs/FlyingThings/Sintel/KITTI/HD1K — and
GMA/core/utils/augmentor.py:15-230). A compact host-side re-design:
every dataset yields ``(im1, im2, flow, valid)`` NHWC float32 numpy
arrays, and ``FlowAugmentor`` applies photometric jitter, random
crop and flips.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from atdn_vslam_tpu.data.flow_io import read_flo, read_kitti_png_flow


def _read_rgb(path: str) -> np.ndarray:
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32)


class FlowPairDataset:
    """Base: lists of (im1, im2, flow file) triples."""

    def __init__(self):
        self.image_pairs: list[tuple[str, str]] = []
        self.flow_files: list[str | None] = []

    def __len__(self) -> int:
        return len(self.image_pairs)

    def _read_flow(self, path: str):
        if path.endswith(".flo"):
            return read_flo(path), None
        if path.endswith(".png"):
            return read_kitti_png_flow(path)
        raise ValueError(f"Unknown flow format: {path}")

    def __getitem__(self, index: int):
        p1, p2 = self.image_pairs[index]
        im1, im2 = _read_rgb(p1), _read_rgb(p2)
        fpath = self.flow_files[index]
        if fpath is None:
            flow = np.zeros((*im1.shape[:2], 2), np.float32)
            valid = np.zeros(im1.shape[:2], np.float32)
        else:
            flow, valid = self._read_flow(fpath)
            if valid is None:
                mag = np.abs(flow).max(-1)
                valid = (mag < 1000).astype(np.float32)
        return im1, im2, np.asarray(flow, np.float32), valid


class FlyingChairsDataset(FlowPairDataset):
    """<root>/data/NNNNN_img{1,2}.ppm + NNNNN_flow.flo
    (ref: datasets.py:127-146)."""

    def __init__(self, root: str):
        super().__init__()
        flows = sorted(glob.glob(os.path.join(root, "data", "*_flow.flo")))
        for f in flows:
            stem = f[: -len("_flow.flo")]
            self.image_pairs.append((stem + "_img1.ppm", stem + "_img2.ppm"))
            self.flow_files.append(f)


class SintelDataset(FlowPairDataset):
    """<root>/<pass>/<scene>/frame_NNNN.png + flow/<scene>/*.flo
    (ref: datasets.py:166-181)."""

    def __init__(self, root: str, split: str = "training",
                 dstype: str = "clean"):
        super().__init__()
        img_root = os.path.join(root, split, dstype)
        flow_root = os.path.join(root, split, "flow")
        for scene in sorted(os.listdir(img_root)):
            frames = sorted(
                glob.glob(os.path.join(img_root, scene, "*.png"))
            )
            for i in range(len(frames) - 1):
                self.image_pairs.append((frames[i], frames[i + 1]))
                flow = os.path.join(
                    flow_root, scene,
                    os.path.basename(frames[i]).replace(".png", ".flo"),
                )
                self.flow_files.append(flow if os.path.exists(flow) else None)


class KittiFlowDataset(FlowPairDataset):
    """KITTI 2015 flow: image_2/NNNNNN_1{0,1}.png + flow_occ
    (ref: datasets.py:231-249)."""

    def __init__(self, root: str, split: str = "training"):
        super().__init__()
        base = os.path.join(root, split)
        im1s = sorted(glob.glob(os.path.join(base, "image_2", "*_10.png")))
        for p1 in im1s:
            p2 = p1.replace("_10.png", "_11.png")
            self.image_pairs.append((p1, p2))
            flow = os.path.join(
                base, "flow_occ", os.path.basename(p1)
            )
            self.flow_files.append(flow if os.path.exists(flow) else None)


class FlowAugmentor:
    """Photometric + spatial augmentation (compact version of
    ref: augmentor.py:15-121): brightness/contrast/saturation jitter,
    random crop to a fixed size, horizontal/vertical flips with flow
    sign fixes."""

    def __init__(
        self,
        crop_size: tuple[int, int],
        h_flip_prob: float = 0.5,
        v_flip_prob: float = 0.1,
        photometric: bool = True,
        seed: int = 0,
    ):
        self.crop = crop_size
        self.h_flip_prob = h_flip_prob
        self.v_flip_prob = v_flip_prob
        self.photometric = photometric
        self.rng = np.random.default_rng(seed)

    def _jitter(self, im: np.ndarray) -> np.ndarray:
        b = self.rng.uniform(0.6, 1.4)
        c = self.rng.uniform(0.6, 1.4)
        s = self.rng.uniform(0.6, 1.4)
        im = im * b
        mean = im.mean(axis=(0, 1), keepdims=True)
        im = (im - mean) * c + mean
        gray = im.mean(axis=-1, keepdims=True)
        im = gray + s * (im - gray)
        return np.clip(im, 0, 255)

    def __call__(self, im1, im2, flow, valid):
        if self.photometric:
            im1, im2 = self._jitter(im1), self._jitter(im2)

        ch, cw = self.crop
        h, w = im1.shape[:2]
        if h < ch or w < cw:
            raise ValueError(f"Image {h}x{w} smaller than crop {ch}x{cw}")
        y0 = int(self.rng.integers(0, h - ch + 1))
        x0 = int(self.rng.integers(0, w - cw + 1))
        im1 = im1[y0 : y0 + ch, x0 : x0 + cw]
        im2 = im2[y0 : y0 + ch, x0 : x0 + cw]
        flow = flow[y0 : y0 + ch, x0 : x0 + cw]
        valid = valid[y0 : y0 + ch, x0 : x0 + cw]

        if self.rng.random() < self.h_flip_prob:
            im1, im2 = im1[:, ::-1], im2[:, ::-1]
            flow = flow[:, ::-1] * np.asarray([-1.0, 1.0], np.float32)
            valid = valid[:, ::-1]
        if self.rng.random() < self.v_flip_prob:
            im1, im2 = im1[::-1], im2[::-1]
            flow = flow[::-1] * np.asarray([1.0, -1.0], np.float32)
            valid = valid[::-1]
        return (
            np.ascontiguousarray(im1), np.ascontiguousarray(im2),
            np.ascontiguousarray(flow), np.ascontiguousarray(valid),
        )
