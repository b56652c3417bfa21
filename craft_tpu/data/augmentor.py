"""Training-time augmentation (reference core/utils/augmentor.py:16-350).

Host-side numpy/PIL/cv2.  The photometric ColorJitter reproduces torchvision's
semantics (random op order, PIL ImageEnhance backends) without the torchvision
dependency, keeping the input pipeline framework-free.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance

try:
    import cv2
    cv2.setNumThreads(0)
    cv2.ocl.setUseOpenCL(False)
except Exception:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# ColorJitter (torchvision parity without torchvision)
# ---------------------------------------------------------------------------

class ColorJitter:
    """brightness/contrast/saturation jitter factors U(max(0,1-v), 1+v);
    hue shift U(-h, h); ops applied in random order (torchvision semantics)."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    @staticmethod
    def _adjust_hue(img: Image.Image, factor: float) -> Image.Image:
        if abs(factor) < 1e-8:
            return img
        h, s, v = img.convert("HSV").split()
        h_np = np.array(h, dtype=np.uint8)
        h_np = (h_np.astype(np.int16) + int(factor * 255)) % 256
        h = Image.fromarray(h_np.astype(np.uint8), "L")
        return Image.merge("HSV", (h, s, v)).convert("RGB")

    def __call__(self, img: Image.Image) -> Image.Image:
        ops = []
        if self.brightness > 0:
            f = random.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast > 0:
            f = random.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation > 0:
            f = random.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue > 0:
            f = random.uniform(-self.hue, self.hue)
            ops.append(lambda im, f=f: self._adjust_hue(im, f))
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


def _resize(img, fx, fy, is_flow=False):
    if cv2 is not None:
        out = cv2.resize(img, None, fx=fx, fy=fy,
                         interpolation=cv2.INTER_LINEAR)
    else:  # pragma: no cover
        H, W = img.shape[:2]
        out = np.array(Image.fromarray(img).resize(
            (int(W * fx), int(H * fy)), Image.BILINEAR))
    return out


def _complementary_spans(extent, delta):
    """Index spans that crop `delta` pixels complementarily from a pair of
    images along one axis: the first span drops from the leading edge when
    delta < 0 (trailing edge when delta > 0), the second the opposite, so
    both spans have length extent - |delta| and frame 2's content sits
    shifted by exactly `delta` relative to frame 1's."""
    lead, trail = max(0, -delta), max(0, delta)
    return slice(lead, extent - trail), slice(trail, extent - lead)


def random_shift(img1, img2, flow, shift_sigmas=(16, 10)):
    """CRAFT shift-consistency augmentation (reference augmentor.py:16-78):
    Laplace-sampled even (dx, dy) with one axis damped x1/4; img1/img2 cropped
    complementarily; flow -= (dx, dy); padded back with a validity mask."""
    u_sigma, v_sigma = shift_sigmas
    if random.random() > 0.5:
        dx = np.random.laplace(0, u_sigma / 4)
        dy = np.random.laplace(0, v_sigma)
    else:
        dx = np.random.laplace(0, u_sigma)
        dy = np.random.laplace(0, v_sigma / 4)
    dx = (int(dx) // 2) * 2
    dy = (int(dy) // 2) * 2

    H, W = img1.shape[:2]
    rows1, rows2 = _complementary_spans(H, dy)
    cols1, cols2 = _complementary_spans(W, dx)
    img1a = img1[rows1, cols1]
    flowa = flow[rows1, cols1] - np.array([dx, dy], flow.dtype)
    img2a = img2[rows2, cols2]

    # Re-center: pad half the dropped pixels onto each side, mask the pad.
    pad_x, pad_y = abs(dx) // 2, abs(dy) // 2
    valid = np.ones(img1a.shape[:2], dtype=bool)
    img1a = np.pad(img1a, ((pad_y, pad_y), (pad_x, pad_x), (0, 0)),
                   "constant")
    img2a = np.pad(img2a, ((pad_y, pad_y), (pad_x, pad_x), (0, 0)),
                   "constant")
    flowa = np.pad(flowa, ((pad_y, pad_y), (pad_x, pad_x), (0, 0)),
                   "constant")
    valid = np.pad(valid, ((pad_y, pad_y), (pad_x, pad_x)), "constant",
                   constant_values=False)
    return img1a, img2a, flowa, valid


class FlowAugmentor:
    """Dense-GT augmentation pipeline (reference augmentor.py:80-204)."""

    def __init__(self, ds_name, crop_size, min_scale=-0.2, max_scale=0.5,
                 spatial_aug_prob=0.8, blur_kernel=5, blur_sigma=-1,
                 do_flip=True, shift_prob=0.0, shift_sigmas=(16, 10)):
        self.ds_name = ds_name
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = spatial_aug_prob
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.shift_prob = shift_prob
        self.shift_sigmas = shift_sigmas
        self.photo_aug = ColorJitter(0.4, 0.4, 0.4, 0.5 / 3.14)
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = 0.5
        self.blur_kernel = blur_kernel
        self.blur_sigma = blur_sigma

    def color_transform(self, img1, img2):
        if np.random.rand() < self.asymmetric_color_aug_prob:
            img1 = np.array(self.photo_aug(Image.fromarray(img1)), np.uint8)
            img2 = np.array(self.photo_aug(Image.fromarray(img2)), np.uint8)
        else:
            stack = np.concatenate([img1, img2], axis=0)
            stack = np.array(self.photo_aug(Image.fromarray(stack)), np.uint8)
            img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        ht, wd = img1.shape[:2]
        if np.random.rand() < self.eraser_aug_prob:
            mean_color = np.mean(img2.reshape(-1, 3), axis=0)
            img2 = img2.copy()
            for _ in range(np.random.randint(1, 3)):
                x0 = np.random.randint(0, wd)
                y0 = np.random.randint(0, ht)
                dx = np.random.randint(bounds[0], bounds[1])
                dy = np.random.randint(bounds[0], bounds[1])
                img2[y0:y0 + dy, x0:x0 + dx, :] = mean_color
        return img1, img2

    def spatial_transform(self, img1, img2, flow):
        ht, wd = img1.shape[:2]
        min_scale = np.maximum((self.crop_size[0] + 8) / float(ht),
                               (self.crop_size[1] + 8) / float(wd))
        scale = 2 ** np.random.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = scale
        if np.random.rand() < self.stretch_prob:
            scale_x *= 2 ** np.random.uniform(-self.max_stretch, self.max_stretch)
            scale_y *= 2 ** np.random.uniform(-self.max_stretch, self.max_stretch)
        scale_x = np.clip(scale_x, min_scale, None)
        scale_y = np.clip(scale_y, min_scale, None)

        if np.random.rand() < self.spatial_aug_prob:
            img1 = _resize(img1, scale_x, scale_y)
            img2 = _resize(img2, scale_x, scale_y)
            flow = _resize(flow, scale_x, scale_y)
            flow = flow * [scale_x, scale_y]

        if self.do_flip:
            if np.random.rand() < self.h_flip_prob:
                img1 = img1[:, ::-1]
                img2 = img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
            if np.random.rand() < self.v_flip_prob:
                img1 = img1[::-1, :]
                img2 = img2[::-1, :]
                flow = flow[::-1, :] * [1.0, -1.0]

        y0 = np.random.randint(0, img1.shape[0] - self.crop_size[0])
        x0 = np.random.randint(0, img1.shape[1] - self.crop_size[1])
        img1 = img1[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        img2 = img2[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        flow = flow[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1, img2, flow

    def __call__(self, img1, img2, flow):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow = self.spatial_transform(img1, img2, flow)

        valid = None
        if self.shift_prob > 0 and random.random() < self.shift_prob:
            img1, img2, flow, valid = random_shift(img1, img2, flow,
                                                   self.shift_sigmas)
        if self.blur_sigma > 0 and cv2 is not None:
            K = self.blur_kernel
            img1 = cv2.GaussianBlur(img1, (K, K), self.blur_sigma)
            img2 = cv2.GaussianBlur(img2, (K, K), self.blur_sigma)

        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow), valid)


class SparseFlowAugmentor:
    """Sparse-GT (KITTI/HD1K/VIPER) pipeline (reference augmentor.py:207-350):
    flow maps are re-scattered to nearest integer cells instead of interpolated."""

    def __init__(self, ds_name, crop_size, min_scale=-0.2, max_scale=0.5,
                 spatial_aug_prob=0.8, do_flip=False, shift_prob=0.0,
                 shift_sigmas=(16, 10)):
        self.ds_name = ds_name
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = spatial_aug_prob
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.shift_prob = shift_prob
        self.shift_sigmas = shift_sigmas
        self.photo_aug = ColorJitter(0.3, 0.3, 0.3, 0.3 / 3.14)
        self.eraser_aug_prob = 0.5

    def color_transform(self, img1, img2):
        stack = np.concatenate([img1, img2], axis=0)
        stack = np.array(self.photo_aug(Image.fromarray(stack)), np.uint8)
        img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def eraser_transform(self, img1, img2):
        ht, wd = img1.shape[:2]
        if np.random.rand() < self.eraser_aug_prob:
            mean_color = np.mean(img2.reshape(-1, 3), axis=0)
            img2 = img2.copy()
            for _ in range(np.random.randint(1, 3)):
                x0 = np.random.randint(0, wd)
                y0 = np.random.randint(0, ht)
                dx = np.random.randint(50, 100)
                dy = np.random.randint(50, 100)
                img2[y0:y0 + dy, x0:x0 + dx, :] = mean_color
        return img1, img2

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx=1.0, fy=1.0):
        ht, wd = flow.shape[:2]
        xs, ys = np.meshgrid(np.arange(wd), np.arange(ht))
        coords = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
        flow_f = flow.reshape(-1, 2).astype(np.float32)
        valid_f = valid.reshape(-1).astype(np.float32)

        coords0 = coords[valid_f >= 1]
        flow0 = flow_f[valid_f >= 1]
        ht1 = int(round(ht * fy))
        wd1 = int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]

        xx = np.round(coords1[:, 0]).astype(np.int32)
        yy = np.round(coords1[:, 1]).astype(np.int32)
        v = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
        flow_img = np.zeros([ht1, wd1, 2], np.float32)
        valid_img = np.zeros([ht1, wd1], np.int32)
        flow_img[yy[v], xx[v]] = flow1[v]
        valid_img[yy[v], xx[v]] = 1
        return flow_img, valid_img

    def spatial_transform(self, img1, img2, flow, valid):
        ht, wd = img1.shape[:2]
        min_scale = np.maximum((self.crop_size[0] + 1) / float(ht),
                               (self.crop_size[1] + 1) / float(wd))
        scale = 2 ** np.random.uniform(self.min_scale, self.max_scale)
        scale_x = np.clip(scale, min_scale, None)
        scale_y = np.clip(scale, min_scale, None)

        if np.random.rand() < self.spatial_aug_prob:
            img1 = _resize(img1, scale_x, scale_y)
            img2 = _resize(img2, scale_x, scale_y)
            flow, valid = self.resize_sparse_flow_map(flow, valid,
                                                      fx=scale_x, fy=scale_y)
        if self.do_flip:
            if np.random.rand() < 0.5:
                img1 = img1[:, ::-1]
                img2 = img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
                valid = valid[:, ::-1]

        margin_y, margin_x = 20, 50
        y0 = np.random.randint(0, img1.shape[0] - self.crop_size[0] + margin_y)
        x0 = np.random.randint(-margin_x,
                               img1.shape[1] - self.crop_size[1] + margin_x)
        y0 = int(np.clip(y0, 0, img1.shape[0] - self.crop_size[0]))
        x0 = int(np.clip(x0, 0, img1.shape[1] - self.crop_size[1]))

        img1 = img1[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        img2 = img2[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        flow = flow[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        valid = valid[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1, img2, flow, valid

    def __call__(self, img1, img2, flow, valid):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, valid = self.spatial_transform(img1, img2, flow, valid)

        if self.shift_prob > 0 and random.random() < self.shift_prob:
            img1, img2, flow, valid2 = random_shift(img1, img2, flow,
                                                    self.shift_sigmas)
            valid = valid * valid2

        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow), np.ascontiguousarray(valid))
