"""Tiling & vision-token-budget arithmetic — deterministic cost model.

Ports the pure arithmetic of the reference's dynamic-tiling preprocessor and
token-budget formula (the tensors around them are out of scope):

- ``find_closest_aspect_ratio``  (process/image_process.py:11-25)
- ``count_tiles``                (process/image_process.py:28-42)
- ``num_image_tokens``           (deepseek_ocr.py:61-106; layout per
                                  process/image_process.py:452-463)

Mode presets per config.py:1-12 / README.md:215-223. These feed unit tests
and the per-turn cost-model column (``sparkocr.extract.dispatch``).
"""

from __future__ import annotations

import math

# Mode presets: (base_size, image_size, crop_mode). config.py:1-6.
MODES = {
    "tiny": (512, 512, False),
    "small": (640, 640, False),
    "base": (1024, 1024, False),
    "large": (1280, 1280, False),
    "gundam": (1024, 640, True),
}

MIN_CROPS = 2  # config.py:11
MAX_CROPS = 6  # config.py:12


def find_closest_aspect_ratio(aspect_ratio, target_ratios, width, height, image_size):
    """process/image_process.py:11-25, transcribed (tie-break included)."""
    best_ratio_diff = float("inf")
    best_ratio = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target_aspect_ratio = ratio[0] / ratio[1]
        ratio_diff = abs(aspect_ratio - target_aspect_ratio)
        if ratio_diff < best_ratio_diff:
            best_ratio_diff = ratio_diff
            best_ratio = ratio
        elif ratio_diff == best_ratio_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best_ratio = ratio
    return best_ratio


def count_tiles(orig_width, orig_height, min_num=MIN_CROPS, max_num=MAX_CROPS, image_size=640):
    """process/image_process.py:28-42 — (i, j) tile grid for an image."""
    aspect_ratio = orig_width / orig_height
    target_ratios = set(
        (i, j)
        for n in range(min_num, max_num + 1)
        for i in range(1, n + 1)
        for j in range(1, n + 1)
        if i * j <= max_num and i * j >= min_num
    )
    target_ratios = sorted(target_ratios, key=lambda x: x[0] * x[1])
    return find_closest_aspect_ratio(
        aspect_ratio, target_ratios, orig_width, orig_height, image_size
    )


def num_image_tokens(
    image_width: int,
    image_height: int,
    base_size: int = 1024,
    image_size: int = 640,
    crop_mode: bool = True,
    patch_size: int = 16,
    downsample_ratio: int = 4,
) -> int:
    """deepseek_ocr.py:61-106 — closed-form vision-token count.

    tokens = h*(w+1) + [tiled: (j*h2)*(i*w2+1)] + 1 with
    h=w=ceil((base_size//patch)/downsample), h2=w2 likewise for image_size.
    Includes the <=640 guard that forces a 1x1 grid (deepseek_ocr.py:79-81).
    """
    if crop_mode:
        if image_width <= 640 and image_height <= 640:
            crop_ratio = (1, 1)
        elif image_width <= 0 or image_height <= 0:
            # corrupt/missing dimension metadata (0 is the usual
            # null-coalesced default): degrade like the small-image path
            # instead of ZeroDivisionError in count_tiles' aspect ratio —
            # note (0, 0) and (100, 0) already fell through the <=640
            # guard above, so only a MIXED case (one dim > 640, other
            # <= 0) used to crash. Deliberate deviation from the
            # reference, which would divide by zero here too.
            crop_ratio = (1, 1)
        else:
            crop_ratio = count_tiles(image_width, image_height, image_size=image_size)
        num_width_tiles, num_height_tiles = crop_ratio
    else:
        num_width_tiles = num_height_tiles = 1

    h = w = math.ceil((base_size // patch_size) / downsample_ratio)
    h2 = w2 = math.ceil((image_size // patch_size) / downsample_ratio)

    global_views_tokens = h * (w + 1)
    if num_width_tiles > 1 or num_height_tiles > 1:
        local_views_tokens = (num_height_tiles * h2) * (num_width_tiles * w2 + 1)
    else:
        local_views_tokens = 0
    return global_views_tokens + local_views_tokens + 1


def num_image_tokens_mode(image_width: int, image_height: int, mode: str = "gundam") -> int:
    base_size, image_size, crop_mode = MODES[mode]
    return num_image_tokens(image_width, image_height, base_size, image_size, crop_mode)
