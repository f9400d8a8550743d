"""Device-side video preprocessing (jit-friendly, explicit PRNG).

Replaces the reference's CPU-side torchvision/pytorchvideo transform stacks
(/root/reference/scripts/general/train_v2.py:143-199 and the Blip2Processor shim
eilev/model/utils.py:5-26) with XLA-fusable ops on (..., C, T, H, W) videos:

  - eval path ("same as BlipImageProcessor"): uniform temporal subsample ->
    bicubic antialias resize -> rescale 1/255 -> CLIP-mean/std normalize, fused
    into one jitted program (:func:`process_videos`);
  - train path ("close to BlipImageTrainProcessor"): subsample -> RandAugment ->
    rescale -> normalize -> RandomResizedCrop(bicubic) -> horizontal flip, all
    under explicit jax.random keys (:func:`train_transform`).

RandAugment here is a faithful RandAugment (Cubuk et al.) with the standard op
set applied video-consistently (one sampled op sequence for all frames of a
clip); it is *equivalent in distribution* to pytorchvideo's, not bit-identical -
augmentation is not a numerical contract, unlike tokenization.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def uniform_temporal_subsample(video: jax.Array, num_samples: int) -> jax.Array:
    """pytorchvideo semantics: linspace(0, T-1, num).long() along the T axis of
    (..., C, T, H, W)."""
    t = video.shape[-3]
    idx = jnp.linspace(0.0, t - 1, num_samples).astype(jnp.int32)
    return jnp.take(video, idx, axis=-3)


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, antialias: bool) -> "np.ndarray":
    """(out, in) separable Keys-cubic (a=-0.5) resampling weights, antialiased
    when downscaling - the same filter family as torchvision/PIL bicubic."""
    import numpy as np

    scale = out_size / in_size
    kernel_scale = min(scale, 1.0) if antialias else 1.0

    def cubic(x):
        x = np.abs(x)
        a = -0.5
        return np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )

    out_pos = (np.arange(out_size) + 0.5) / scale - 0.5  # source coords
    in_pos = np.arange(in_size)
    w = cubic((out_pos[:, None] - in_pos[None, :]) * kernel_scale)
    w = w / w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


def resize_video(video: jax.Array, height: int, width: int, *, antialias: bool = True) -> jax.Array:
    """Bicubic resize of the trailing (H, W) dims (torchvision Resize(bicubic,
    antialias=True) analogue).

    Implemented as two separable matmuls with precomputed cubic weights: the
    resample rides the MXU as dense GEMMs instead of jax.image's general-conv
    lowering, which is pathologically slow on TPU.
    """
    *lead, h, w = video.shape
    if (h, w) == (height, width):
        return video.astype(jnp.float32)
    wh = jnp.asarray(_resize_matrix(h, height, antialias))  # (H', H)
    ww = jnp.asarray(_resize_matrix(w, width, antialias))  # (W', W)
    x = video.astype(jnp.float32)
    x = jnp.einsum("...hw,oh->...ow", x, wh)
    x = jnp.einsum("...hw,pw->...hp", x, ww)
    return x


def rescale(video: jax.Array) -> jax.Array:
    return video.astype(jnp.float32) / 255.0


def normalize(video: jax.Array, mean: Sequence[float] = CLIP_MEAN, std: Sequence[float] = CLIP_STD) -> jax.Array:
    """Channel-first normalize over (..., C, T, H, W)."""
    mean_a = jnp.asarray(mean, video.dtype).reshape(-1, 1, 1, 1)
    std_a = jnp.asarray(std, video.dtype).reshape(-1, 1, 1, 1)
    return (video - mean_a) / std_a


@functools.partial(jax.jit, static_argnames=("num_frames", "height", "width", "dtype"))
def process_videos(
    videos: jax.Array,
    num_frames: Optional[int] = None,
    height: int = 224,
    width: int = 224,
    dtype=jnp.float32,
) -> jax.Array:
    """The ``process()`` / eval-transform equivalent, one fused program:
    (B, C, T, H, W) uint8 -> subsample -> resize -> rescale -> normalize ->
    (B, C, num_frames, height, width) in ``dtype``.

    Reference: eilev/model/utils.py:5-26 + train_v2.py:182-199.
    """
    x = videos
    if num_frames is not None:
        x = uniform_temporal_subsample(x, num_frames)
    # jax.image antialiased resize lowers to a general conv that is very slow on
    # TPU even at identity scale; skip it when the size already matches
    # (measured: 9.4 -> 36 videos/s on the 16-shot bench).
    if x.shape[-2:] != (height, width):
        x = resize_video(x, height, width)
    x = rescale(x)
    x = normalize(x)
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# random transforms (explicit keys)
# ---------------------------------------------------------------------------


def random_horizontal_flip(key: jax.Array, video: jax.Array, p: float = 0.5) -> jax.Array:
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, video[..., ::-1], video)


def random_resized_crop(
    key: jax.Array,
    video: jax.Array,
    height: int,
    width: int,
    scale: tuple[float, float] = (0.5, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jax.Array:
    """torchvision RandomResizedCrop semantics under jit: sample area in
    ``scale`` * source area and aspect in log-uniform ``ratio``; ten vectorized
    candidates, first feasible wins, center-crop fallback. Crop + bicubic resize
    are fused into one ``jax.image.scale_and_translate``."""
    *lead, t, h, w = video.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 10
    area = h * w
    target_area = jax.random.uniform(k1, (n,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k2, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.sqrt(target_area * aspect).astype(jnp.int32)
    ch = jnp.sqrt(target_area / aspect).astype(jnp.int32)
    ok = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    first = jnp.argmax(ok)  # first feasible candidate (0 if none; gated below)
    any_ok = jnp.any(ok)
    # fallback: center crop at clamped aspect (torchvision's fallback)
    in_ratio = w / h
    fb_w = jnp.where(in_ratio < ratio[0], w, jnp.where(in_ratio > ratio[1], jnp.int32(round(h * ratio[1])), w))
    fb_h = jnp.where(in_ratio < ratio[0], jnp.int32(round(w / ratio[0])), jnp.where(in_ratio > ratio[1], h, h))
    crop_w = jnp.where(any_ok, cw[first], fb_w).astype(jnp.float32)
    crop_h = jnp.where(any_ok, ch[first], fb_h).astype(jnp.float32)
    max_i = (h - crop_h).astype(jnp.float32)
    max_j = (w - crop_w).astype(jnp.float32)
    i = jnp.floor(jax.random.uniform(k3) * (max_i + 1.0))
    j = jnp.floor(jax.random.uniform(k4) * (max_j + 1.0))
    i = jnp.where(any_ok, i, max_i / 2.0)
    j = jnp.where(any_ok, j, max_j / 2.0)

    # fused crop+resize: out = scale * in + translate on the (H, W) axes
    sy = height / crop_h
    sx = width / crop_w
    ty = -i * sy
    tx = -j * sx
    flat = video.reshape(-1, h, w).astype(jnp.float32)
    out = jax.vmap(
        lambda img: jax.image.scale_and_translate(
            img[None],
            (1, height, width),
            (1, 2),
            jnp.stack([sy, sx]),
            jnp.stack([ty, tx]),
            method="cubic",
        )[0]
    )(flat)
    return out.reshape(*lead, t, height, width)


# ---------------------------------------------------------------------------
# RandAugment
# ---------------------------------------------------------------------------

_MAX_MAGNITUDE = 10.0


def _blend(a: jax.Array, b: jax.Array, factor: jax.Array) -> jax.Array:
    return jnp.clip(b + factor * (a - b), 0.0, 255.0)


def _gray(video: jax.Array) -> jax.Array:
    # video (C, T, H, W); ITU-R 601-2 luma, like PIL convert("L")
    r, g, b = video[0], video[1], video[2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _affine(video: jax.Array, matrix: jax.Array) -> jax.Array:
    """Apply a 2x3 inverse affine to the (H, W) axes of (C, T, H, W), bilinear,
    zero fill, centered at the image center."""
    c, t, h, w = video.shape
    yy = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xx = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    src_y = matrix[0, 0] * gy + matrix[0, 1] * gx + matrix[0, 2] + (h - 1) / 2.0
    src_x = matrix[1, 0] * gy + matrix[1, 1] * gx + matrix[1, 2] + (w - 1) / 2.0
    coords = jnp.stack([src_y, src_x])
    flat = video.reshape(c * t, h, w)
    out = jax.vmap(
        lambda img: jax.scipy.ndimage.map_coordinates(img, list(coords), order=1, cval=0.0)
    )(flat)
    return out.reshape(c, t, h, w)


def _op_identity(v, m):
    return v


def _op_auto_contrast(v, m):
    lo = v.min(axis=(-2, -1), keepdims=True)
    hi = v.max(axis=(-2, -1), keepdims=True)
    scale_f = 255.0 / jnp.maximum(hi - lo, 1e-5)
    return jnp.where(hi > lo, (v - lo) * scale_f, v)


def _op_equalize(v, m):
    """Per-frame, per-channel histogram equalization (PIL semantics)."""

    def eq_img(img):
        b = jnp.clip(img, 0, 255).astype(jnp.int32)
        hist = jnp.zeros(256, jnp.float32).at[b.reshape(-1)].add(1.0)
        # PIL: step = (total - last_nonzero_bin) // 255
        nonzero = hist > 0
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        step = (img.size - hist[last_idx]) // 255
        cum = jnp.cumsum(hist)
        lut = jnp.clip(((cum - hist / 2.0) + step / 2.0) / jnp.maximum(step, 1), 0, 255)
        out = lut[b]
        return jnp.where(step <= 0, img, out)

    c, t, h, w = v.shape
    return jax.vmap(eq_img)(v.reshape(c * t, h, w)).reshape(v.shape)


def _op_solarize(v, m):
    threshold = 255.0 - (m / _MAX_MAGNITUDE) * 255.0
    return jnp.where(v >= threshold, 255.0 - v, v)


def _op_posterize(v, m):
    bits = 8 - (m / _MAX_MAGNITUDE * 4.0).astype(jnp.int32)
    shift = 8 - bits
    iv = jnp.clip(v, 0, 255).astype(jnp.int32)
    return ((iv >> shift) << shift).astype(v.dtype)


def _signed(m, key):
    sign = jnp.where(jax.random.bernoulli(key, 0.5), 1.0, -1.0)
    return sign * m / _MAX_MAGNITUDE


def _op_color(v, m, key):
    gray = _gray(v)[None]
    return _blend(v, jnp.broadcast_to(gray, v.shape), 1.0 + _signed(m, key) * 0.9)


def _op_contrast(v, m, key):
    mean = _gray(v).mean(axis=(-2, -1), keepdims=True)[None]
    return _blend(v, jnp.broadcast_to(mean, v.shape), 1.0 + _signed(m, key) * 0.9)


def _op_brightness(v, m, key):
    return _blend(v, jnp.zeros_like(v), 1.0 + _signed(m, key) * 0.9)


def _op_sharpness(v, m, key):
    kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    c, t, h, w = v.shape
    flat = v.reshape(c * t, 1, h, w)
    sm = jax.lax.conv_general_dilated(
        flat, kernel[None, None], (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    ).reshape(v.shape)
    # PIL only smooths the interior
    interior = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    sm = jnp.where(interior, sm, v)
    return _blend(sm, v, 1.0 - (1.0 + _signed(m, key) * 0.9))


def _op_rotate(v, m, key):
    deg = _signed(m, key) * 30.0
    rad = jnp.deg2rad(deg)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    matrix = jnp.asarray([[cos, sin, 0.0], [-sin, cos, 0.0]])
    return _affine(v, matrix)


def _op_shear_x(v, m, key):
    s = _signed(m, key) * 0.3
    return _affine(v, jnp.asarray([[1.0, 0.0, 0.0], [s, 1.0, 0.0]]))


def _op_shear_y(v, m, key):
    s = _signed(m, key) * 0.3
    return _affine(v, jnp.asarray([[1.0, s, 0.0], [0.0, 1.0, 0.0]]))


def _op_translate_x(v, m, key):
    t = _signed(m, key) * 0.45 * v.shape[-1]
    return _affine(v, jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, -t]]))


def _op_translate_y(v, m, key):
    t = _signed(m, key) * 0.45 * v.shape[-2]
    return _affine(v, jnp.asarray([[1.0, 0.0, -t], [0.0, 1.0, 0.0]]))


_RAND_AUG_OPS = [
    lambda v, m, k: _op_identity(v, m),
    lambda v, m, k: _op_auto_contrast(v, m),
    lambda v, m, k: _op_equalize(v, m),
    lambda v, m, k: _op_solarize(v, m),
    lambda v, m, k: _op_posterize(v, m),
    _op_color,
    _op_contrast,
    _op_brightness,
    _op_sharpness,
    _op_rotate,
    _op_shear_x,
    _op_shear_y,
    _op_translate_x,
    _op_translate_y,
]


def rand_augment(
    key: jax.Array,
    video: jax.Array,
    magnitude: float = 5.0,
    num_layers: int = 2,
    prob: float = 0.5,
) -> jax.Array:
    """RandAugment on a (C, T, H, W) uint8/float video in [0, 255]; the sampled
    op sequence is shared by all frames (video-consistent, like pytorchvideo)."""
    v = video.astype(jnp.float32)
    for _ in range(num_layers):
        key, k_op, k_apply, k_param = jax.random.split(key, 4)
        op_idx = jax.random.randint(k_op, (), 0, len(_RAND_AUG_OPS))
        branches = [
            functools.partial(lambda f, args: f(*args), f)
            for f in _RAND_AUG_OPS
        ]
        augmented = jax.lax.switch(op_idx, branches, (v, jnp.float32(magnitude), k_param))
        v = jnp.where(jax.random.bernoulli(k_apply, prob), augmented, v)
    return v


# ---------------------------------------------------------------------------
# full train transform
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_frames", "height", "width", "magnitude", "dtype"),
)
def train_transform(
    key: jax.Array,
    video: jax.Array,
    num_frames: int = 8,
    height: int = 224,
    width: int = 224,
    magnitude: float = 5.0,
    dtype=jnp.float32,
) -> jax.Array:
    """The train_v2 augmentation stack (reference train_v2.py:143-167) fused into
    one program: (C, T, H, W) uint8 -> subsample -> RandAugment -> rescale ->
    normalize -> RandomResizedCrop(0.5-1.0, bicubic) -> hflip."""
    k_aug, k_crop, k_flip = jax.random.split(key, 3)
    x = uniform_temporal_subsample(video, num_frames)
    x = rand_augment(k_aug, x, magnitude=magnitude)
    x = rescale(x)
    x = normalize(x)
    x = random_resized_crop(k_crop, x, height, width, scale=(0.5, 1.0))
    x = random_horizontal_flip(k_flip, x)
    return x.astype(dtype)


def random_short_side_scale(
    key: jax.Array, video: jax.Array, min_size: int, max_size: int
) -> jax.Array:
    """pytorchvideo RandomShortSideScale: resize so the short side is a uniform
    random int in [min_size, max_size] (bilinear). Static output shape under jit
    requires a concrete size, so this op samples the size host-side from the key."""
    import numpy as np

    size = int(jax.random.randint(key, (), min_size, max_size + 1))
    *lead, t, h, w = video.shape
    if h < w:
        nh, nw = size, int(np.floor(w / h * size))
    else:
        nh, nw = int(np.floor(h / w * size)), size
    shape = (*video.shape[:-2], nh, nw)
    return jax.image.resize(video.astype(jnp.float32), shape, method="bilinear")


def random_crop(key: jax.Array, video: jax.Array, height: int, width: int) -> jax.Array:
    """Uniform random spatial crop of the trailing (H, W) dims."""
    h, w = video.shape[-2], video.shape[-1]
    k1, k2 = jax.random.split(key)
    top = jax.random.randint(k1, (), 0, max(h - height, 0) + 1)
    left = jax.random.randint(k2, (), 0, max(w - width, 0) + 1)
    start = [0] * (video.ndim - 2) + [top, left]
    sizes = list(video.shape[:-2]) + [height, width]
    return jax.lax.dynamic_slice(video, start, sizes)
