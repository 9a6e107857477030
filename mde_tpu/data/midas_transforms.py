"""MiDaS-style numpy preprocessing transforms (public-surface parity).

The reference ships ``src/preprocessing/transforms.py`` (366 LoC, vestigial in
the live path but part of the public API surface — SURVEY.md §2.2): callable
transforms over sample dicts {"image": HWC float [0,1], "disparity"/"depth"/
"mask": ...} with a MiDaS-flavoured Resize supporting aspect-ratio preservation
and ensure-multiple-of constraints, plus NormalizeImage and PrepareForNet, and a
registry of named pipelines per model family (transforms.py:5-137).

These are host-side numpy/cv2 utilities (used for one-off inference on arbitrary
images); the training path uses the fused on-device pipeline in
data/transforms.py instead.
"""

from __future__ import annotations

import math
from typing import Optional

import cv2
import numpy as np


def apply_min_size(sample: dict, size, image_interpolation_method=cv2.INTER_AREA) -> tuple:
    """Rescale so the sample is at least ``size`` (transforms.py:138-177)."""
    shape = list(sample["disparity"].shape)
    if shape[0] >= size[0] and shape[1] >= size[1]:
        return sample
    scale = [size[0] / shape[0], size[1] / shape[1]]
    scale = max(scale)
    shape[0] = math.ceil(scale * shape[0])
    shape[1] = math.ceil(scale * shape[1])
    sample["image"] = cv2.resize(
        sample["image"], tuple(shape[::-1]), interpolation=image_interpolation_method
    )
    sample["disparity"] = cv2.resize(
        sample["disparity"], tuple(shape[::-1]), interpolation=cv2.INTER_NEAREST
    )
    sample["mask"] = cv2.resize(
        sample["mask"].astype(np.float32), tuple(shape[::-1]), interpolation=cv2.INTER_NEAREST
    )
    return tuple(shape)


class Resize:
    """Resize with keep-aspect / multiple-of constraints (transforms.py:180-326)."""

    def __init__(
        self,
        width: int,
        height: int,
        resize_target: bool = True,
        keep_aspect_ratio: bool = False,
        ensure_multiple_of: int = 1,
        resize_method: str = "lower_bound",
        image_interpolation_method=cv2.INTER_AREA,
    ):
        self.__width = width
        self.__height = height
        self.__resize_target = resize_target
        self.__keep_aspect_ratio = keep_aspect_ratio
        self.__multiple_of = ensure_multiple_of
        self.__resize_method = resize_method
        self.__image_interpolation_method = image_interpolation_method

    def constrain_to_multiple_of(self, x, min_val=0, max_val=None):
        y = (np.round(x / self.__multiple_of) * self.__multiple_of).astype(int)
        if max_val is not None and y > max_val:
            y = (np.floor(x / self.__multiple_of) * self.__multiple_of).astype(int)
        if y < min_val:
            y = (np.ceil(x / self.__multiple_of) * self.__multiple_of).astype(int)
        return y

    def get_size(self, width, height):
        scale_height = self.__height / height
        scale_width = self.__width / width
        if self.__keep_aspect_ratio:
            if self.__resize_method == "lower_bound":
                if scale_width > scale_height:
                    scale_height = scale_width
                else:
                    scale_width = scale_height
            elif self.__resize_method == "upper_bound":
                if scale_width < scale_height:
                    scale_height = scale_width
                else:
                    scale_width = scale_height
            elif self.__resize_method == "minimal":
                if abs(1 - scale_width) < abs(1 - scale_height):
                    scale_height = scale_width
                else:
                    scale_width = scale_height
            else:
                raise ValueError(f"resize_method {self.__resize_method} not implemented")

        if self.__resize_method == "lower_bound":
            new_height = self.constrain_to_multiple_of(scale_height * height, min_val=self.__height)
            new_width = self.constrain_to_multiple_of(scale_width * width, min_val=self.__width)
        elif self.__resize_method == "upper_bound":
            new_height = self.constrain_to_multiple_of(scale_height * height, max_val=self.__height)
            new_width = self.constrain_to_multiple_of(scale_width * width, max_val=self.__width)
        elif self.__resize_method == "minimal":
            new_height = self.constrain_to_multiple_of(scale_height * height)
            new_width = self.constrain_to_multiple_of(scale_width * width)
        else:
            raise ValueError(f"resize_method {self.__resize_method} not implemented")
        return (new_width, new_height)

    def __call__(self, sample: dict) -> dict:
        width, height = self.get_size(
            sample["image"].shape[1], sample["image"].shape[0]
        )
        sample["image"] = cv2.resize(
            sample["image"], (width, height), interpolation=self.__image_interpolation_method
        )
        if self.__resize_target:
            for key in ("disparity", "depth"):
                if key in sample:
                    sample[key] = cv2.resize(
                        sample[key], (width, height), interpolation=cv2.INTER_NEAREST
                    )
            if "mask" in sample:
                sample["mask"] = cv2.resize(
                    sample["mask"].astype(np.float32), (width, height),
                    interpolation=cv2.INTER_NEAREST,
                )
        return sample


class NormalizeImage:
    """(image - mean) / std (transforms.py:329-340)."""

    def __init__(self, mean, std):
        self.__mean = mean
        self.__std = std

    def __call__(self, sample: dict) -> dict:
        sample["image"] = (sample["image"] - self.__mean) / self.__std
        return sample


class PrepareForNet:
    """HWC -> CHW contiguous float32 (transforms.py:343-363)."""

    def __call__(self, sample: dict) -> dict:
        image = np.transpose(sample["image"], (2, 0, 1))
        sample["image"] = np.ascontiguousarray(image).astype(np.float32)
        if "mask" in sample:
            sample["mask"] = np.ascontiguousarray(sample["mask"].astype(np.float32))
        for key in ("disparity", "depth"):
            if key in sample:
                sample[key] = np.ascontiguousarray(sample[key].astype(np.float32))
        return sample


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


def _pipeline(width, height, keep_aspect_ratio, ensure_multiple_of, resize_method, mean, std):
    return Compose(
        [
            Resize(
                width,
                height,
                resize_target=True,
                keep_aspect_ratio=keep_aspect_ratio,
                ensure_multiple_of=ensure_multiple_of,
                resize_method=resize_method,
                image_interpolation_method=cv2.INTER_CUBIC,
            ),
            NormalizeImage(mean=mean, std=std),
            PrepareForNet(),
        ]
    )


_IMAGENET = (np.asarray([0.485, 0.456, 0.406]), np.asarray([0.229, 0.224, 0.225]))
_MIDAS = (np.asarray([0.5, 0.5, 0.5]), np.asarray([0.5, 0.5, 0.5]))


def transforms() -> dict:
    """Named pipeline registry mirroring transforms.py:5-137."""
    reg = {}
    reg["default"] = _pipeline(384, 384, True, 32, "upper_bound", *_MIDAS)
    reg["small"] = _pipeline(256, 256, True, 32, "upper_bound", *_MIDAS)
    reg["dpt"] = _pipeline(384, 384, True, 32, "minimal", *_IMAGENET)
    reg["beit512"] = _pipeline(512, 512, True, 32, "minimal", *_IMAGENET)
    reg["swin384"] = _pipeline(384, 384, False, 32, "minimal", *_IMAGENET)
    reg["swin256"] = _pipeline(256, 256, False, 32, "minimal", *_IMAGENET)
    reg["levit"] = _pipeline(224, 224, False, 32, "minimal", *_IMAGENET)
    return reg
