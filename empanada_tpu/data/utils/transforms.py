"""Image/mask augmentations (albumentations-compatible surface, no deps).

The reference composes albumentations transforms named in config
(reference scripts/train.py:224-245, data/utils/transforms.py:42-53).
albumentations isn't a dependency here, so the transforms used by the
shipped configs are implemented on numpy + cv2 with the same names,
parameters, and dict-call convention::

    tfs = Compose([RandomScale(...), ...])
    out = tfs(image=img, mask=msk)   # {'image': ..., 'mask': ...}

Images are HWC (or HW) numpy; masks are transformed with nearest
interpolation and no photometric changes.
"""

from __future__ import annotations

import math

import cv2
import numpy as np

__all__ = [
    "Compose",
    "RandomScale",
    "PadIfNeeded",
    "RandomCrop",
    "CenterCrop",
    "Rotate",
    "RandomBrightnessContrast",
    "HorizontalFlip",
    "VerticalFlip",
    "GaussNoise",
    "GaussianBlur",
    "Normalize",
    "FactorPad",
    "resize_by_factor",
    "factor_pad_numpy",
    "create_augmentations",
]


def resize_by_factor(image, scale_factor=1):
    """Downscale (H, W) image by a factor (reference transforms.py:9-21)."""
    if scale_factor == 1:
        return image
    h, w = image.shape
    dh = math.ceil(h / scale_factor)
    dw = math.ceil(w / scale_factor)
    return cv2.resize(image, (dw, dh), interpolation=cv2.INTER_LINEAR)


def factor_pad_numpy(image, factor=128):
    """Bottom/right zero-pad to a multiple of factor
    (reference transforms.py:23-39)."""
    h, w = image.shape[:2]
    pad_bottom = (-h) % factor
    pad_right = (-w) % factor
    if image.ndim == 3:
        padding = ((0, pad_bottom), (0, pad_right), (0, 0))
    else:
        padding = ((0, pad_bottom), (0, pad_right))
    return np.pad(image, padding)


class _Transform:
    """Base: applies with probability p; subclasses define params/apply."""

    def __init__(self, p=0.5):
        self.p = p

    def get_params(self, rng, image):
        return {}

    def apply_image(self, image, **params):
        return image

    def apply_mask(self, mask, **params):
        return mask

    def __call__(self, rng, out):
        if rng.random() >= self.p:
            return out
        params = self.get_params(rng, out["image"])
        out["image"] = self.apply_image(out["image"], **params)
        if out.get("mask") is not None:
            out["mask"] = self.apply_mask(out["mask"], **params)
        return out


class Compose:
    """Applies transforms with per-thread RNGs: the DataLoader builds
    examples on a thread pool and numpy Generators are not thread-safe,
    so each worker thread draws from its own spawned stream.

    Note: which stream serves a given example depends on thread
    scheduling, so augmentations are seeded-but-not-bitwise-reproducible
    with num_workers > 1 (same property as the reference's torch
    DataLoader + albumentations workers)."""

    def __init__(self, transforms, seed=None):
        import threading

        self.transforms = transforms
        self._seed_seq = np.random.SeedSequence(seed)
        self._local = threading.local()
        self._lock = threading.Lock()

    @property
    def rng(self):
        rng = getattr(self._local, "rng", None)
        if rng is None:
            with self._lock:
                child = self._seed_seq.spawn(1)[0]
            rng = np.random.default_rng(child)
            self._local.rng = rng
        return rng

    def __call__(self, image, mask=None, **kwargs):
        rng = self.rng
        out = {"image": image, "mask": mask}
        for t in self.transforms:
            out = t(rng, out)
        if mask is None:
            out.pop("mask")
        return out


def _resize(img, size, nearest=False):
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    out = cv2.resize(img, (size[1], size[0]), interpolation=interp)
    if img.ndim == 3 and out.ndim == 2:
        out = out[..., None]
    return out


class RandomScale(_Transform):
    def __init__(self, scale_limit=(-0.1, 0.1), p=0.5):
        super().__init__(p)
        if np.isscalar(scale_limit):
            scale_limit = (-scale_limit, scale_limit)
        self.scale_limit = scale_limit

    def get_params(self, rng, image):
        return {"scale": 1.0 + rng.uniform(*self.scale_limit)}

    def apply_image(self, image, scale):
        h, w = image.shape[:2]
        return _resize(image, (max(1, round(h * scale)),
                               max(1, round(w * scale))))

    def apply_mask(self, mask, scale):
        h, w = mask.shape[:2]
        return _resize(mask, (max(1, round(h * scale)),
                              max(1, round(w * scale))), nearest=True)


class PadIfNeeded(_Transform):
    def __init__(self, min_height, min_width, border_mode=0, p=1.0):
        super().__init__(p)
        self.min_height = min_height
        self.min_width = min_width

    def _pad(self, img):
        h, w = img.shape[:2]
        ph = max(0, self.min_height - h)
        pw = max(0, self.min_width - w)
        if ph == 0 and pw == 0:
            return img
        top, left = ph // 2, pw // 2
        pad = [(top, ph - top), (left, pw - left)]
        if img.ndim == 3:
            pad.append((0, 0))
        return np.pad(img, pad)

    def apply_image(self, image):
        return self._pad(image)

    def apply_mask(self, mask):
        return self._pad(mask)


class RandomCrop(_Transform):
    def __init__(self, height, width, p=1.0):
        super().__init__(p)
        self.height = height
        self.width = width

    def get_params(self, rng, image):
        h, w = image.shape[:2]
        return {"hs": rng.random(), "ws": rng.random()}

    def _crop(self, img, hs, ws):
        h, w = img.shape[:2]
        y0 = int((h - self.height) * hs) if h > self.height else 0
        x0 = int((w - self.width) * ws) if w > self.width else 0
        return img[y0:y0 + self.height, x0:x0 + self.width]

    apply_image = _crop
    apply_mask = _crop


class CenterCrop(_Transform):
    def __init__(self, height, width, p=1.0):
        super().__init__(p)
        self.height = height
        self.width = width

    def _crop(self, img):
        h, w = img.shape[:2]
        y0 = max(0, (h - self.height) // 2)
        x0 = max(0, (w - self.width) // 2)
        return img[y0:y0 + self.height, x0:x0 + self.width]

    def apply_image(self, image):
        return self._crop(image)

    def apply_mask(self, mask):
        return self._crop(mask)


class Rotate(_Transform):
    def __init__(self, limit=90, border_mode=0, p=0.5):
        super().__init__(p)
        self.limit = limit if not np.isscalar(limit) else (-limit, limit)

    def get_params(self, rng, image):
        return {"angle": rng.uniform(*self.limit)}

    def _rotate(self, img, angle, nearest=False):
        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        out = cv2.warpAffine(img, m, (w, h), flags=interp,
                             borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        if img.ndim == 3 and out.ndim == 2:
            out = out[..., None]
        return out

    def apply_image(self, image, angle):
        return self._rotate(image, angle)

    def apply_mask(self, mask, angle):
        return self._rotate(mask, angle, nearest=True)


class RandomBrightnessContrast(_Transform):
    def __init__(self, brightness_limit=0.2, contrast_limit=0.2, p=0.5):
        super().__init__(p)
        self.brightness_limit = brightness_limit \
            if not np.isscalar(brightness_limit) \
            else (-brightness_limit, brightness_limit)
        self.contrast_limit = contrast_limit \
            if not np.isscalar(contrast_limit) \
            else (-contrast_limit, contrast_limit)

    def get_params(self, rng, image):
        return {"alpha": 1.0 + rng.uniform(*self.contrast_limit),
                "beta": rng.uniform(*self.brightness_limit)}

    def apply_image(self, image, alpha, beta):
        dtype = image.dtype
        if np.issubdtype(dtype, np.integer):
            max_value = float(np.iinfo(dtype).max)
        else:
            max_value = 1.0
        out = image.astype(np.float32) * alpha + beta * max_value
        return np.clip(out, 0, max_value).astype(dtype)


class HorizontalFlip(_Transform):
    def apply_image(self, image):
        return np.ascontiguousarray(image[:, ::-1])

    apply_mask = apply_image


class VerticalFlip(_Transform):
    def apply_image(self, image):
        return np.ascontiguousarray(image[::-1])

    apply_mask = apply_image


class GaussNoise(_Transform):
    def __init__(self, var_limit=(10.0, 50.0), p=0.5):
        super().__init__(p)
        self.var_limit = var_limit

    def get_params(self, rng, image):
        sigma = rng.uniform(*self.var_limit) ** 0.5
        return {"noise": rng.normal(0, sigma, image.shape).astype(np.float32)}

    def apply_image(self, image, noise):
        dtype = image.dtype
        if np.issubdtype(dtype, np.integer):
            lo, hi = np.iinfo(dtype).min, np.iinfo(dtype).max
        else:
            lo, hi = 0.0, 1.0
        return np.clip(image.astype(np.float32) + noise, lo, hi).astype(dtype)


class GaussianBlur(_Transform):
    def __init__(self, blur_limit=(3, 7), p=0.5):
        super().__init__(p)
        self.blur_limit = blur_limit

    def get_params(self, rng, image):
        k = int(rng.integers(self.blur_limit[0] // 2,
                             self.blur_limit[1] // 2 + 1)) * 2 + 1
        return {"ksize": k}

    def apply_image(self, image, ksize):
        out = cv2.GaussianBlur(image, (ksize, ksize), 0)
        if image.ndim == 3 and out.ndim == 2:
            out = out[..., None]
        return out


class Normalize(_Transform):
    """(img / max_pixel_value - mean) / std -> float32, always applied.

    Divides by max_pixel_value regardless of dtype (albumentations
    semantics — float volumes holding 0-255 intensities scale the same
    as uint8 ones)."""

    def __init__(self, mean=0.0, std=1.0, max_pixel_value=255.0, p=1.0):
        super().__init__(p)
        self.mean = mean
        self.std = std
        self.max_pixel_value = max_pixel_value

    def apply_image(self, image):
        img = image.astype(np.float32) / self.max_pixel_value
        return (img - self.mean) / self.std


class FactorPad(_Transform):
    def __init__(self, factor=128, p=1.0):
        super().__init__(p)
        self.factor = factor

    def apply_image(self, image):
        return factor_pad_numpy(image, self.factor)

    apply_mask = apply_image


AUGMENTATIONS = {
    "RandomScale": RandomScale,
    "PadIfNeeded": PadIfNeeded,
    "RandomCrop": RandomCrop,
    "CenterCrop": CenterCrop,
    "Rotate": Rotate,
    "RandomBrightnessContrast": RandomBrightnessContrast,
    "HorizontalFlip": HorizontalFlip,
    "VerticalFlip": VerticalFlip,
    "GaussNoise": GaussNoise,
    "GaussianBlur": GaussianBlur,
    "Normalize": Normalize,
    "FactorPad": FactorPad,
}


def create_augmentations(aug_config, norms=None, seed=None):
    """Config list [{'aug': name, **params}, ...] -> Compose, appending
    Normalize(norms) last (reference scripts/train.py:224-245)."""
    transforms = []
    for entry in aug_config or []:
        params = {k: v for k, v in entry.items() if k != "aug"}
        name = entry["aug"]
        if name not in AUGMENTATIONS:
            raise ValueError(f"unknown augmentation {name!r}")
        transforms.append(AUGMENTATIONS[name](**params))
    if norms is not None:
        transforms.append(Normalize(mean=norms["mean"], std=norms["std"]))
    return Compose(transforms, seed=seed)
