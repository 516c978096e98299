"""Device-side augmentation kernels — the TPU-native `batch_resize`.

Behavioral parity targets: per-image ColorJitter + normalization
(`dataloader/dataloader.py:348-402`) and the per-batch shared scale/rotation
collate (`batch_resize`, `dataloader/dataloader.py:507-586`): ONE scale and
ONE angle per minibatch, bilinear for images / nearest for labels, fill -1
(0 for semantics), focal scaled, pose post-multiplied by an in-plane
rotation (`:430-438`).

TPU-first divergence (measured — AUG_NOTES.md): the reference materializes
a *resized* canvas (dynamic shapes per batch). XLA requires static shapes,
so we sample the scaled+rotated view on a FIXED canvas through one
inverse-affine gather: zoom-in crops a window, zoom-out pads with the fill
value. A center-only zoom-in crop would bias supervision toward the image
center (border cells never seen at high resolution), so the crop window is
drawn uniformly over the feasible range (one shared draw per batch, like
scale/angle); the induced principal-point shift is returned so the loss's
camera matrix keeps the (image, pose, focal, label) tuple exactly
geometrically consistent — tests assert zero reprojection error of
augmented dense labels under the augmented camera, translation included.

Grayscale conversion uses the ITU-R 601 luma weights (PIL's `Grayscale`).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .dataset import GRAY_MEAN, GRAY_STD, RGB_MEAN, RGB_STD


class AugmentConfig(NamedTuple):
    aug_rotation: float = 30.0  # max |angle| in degrees
    aug_scale_min: float = 2.0 / 3.0
    aug_scale_max: float = 3.0 / 2.0
    aug_brightness: float = 0.1
    aug_contrast: float = 0.1
    aug_translation: bool = True  # random zoom-in crop window (see module doc)
    grayscale: bool = False
    nodata_value: float = -1.0
    subsample: int = 8
    # Gather the image's bilinear corner windows in bf16 (interpolation still
    # accumulates in f32, labels/poses/focal untouched): halves the resample's
    # HBM reads, ~32% faster gather on v5e (BENCH_NOTES round 3). The only
    # error is bf16 rounding of the corner VALUES (<=2^-8 relative, ~0.01 abs
    # on normalized images) — train-time-only noise well below the +-10%
    # ColorJitter the same pipeline applies. Default off so CPU parity tests
    # exercise full-f32 sampling; the TPU training surfaces enable it.
    image_gather_bf16: bool = False
    # Gather corner windows from a batch-inside [H, W, B*C] re-layout of the
    # image (the warp is per-batch shared, so every output pixel's window is
    # the same for all images): 4 contiguous [B*C] fragments per gather row
    # instead of 4*B C-sized ones — ~12x fewer DMA fragments for identical
    # bytes (tools/gather_layout_probe.py). Bit-exact vs the per-image path
    # (same 4-term weighted sum). Default off pending the TPU probe.
    gather_batch_inside: bool = False


def to_grayscale(images):
    """[B, H, W, 3] -> [B, H, W, 1], ITU-R 601 luma (PIL Grayscale)."""
    w = jnp.asarray([0.299, 0.587, 0.114], images.dtype)
    return jnp.sum(images * w, axis=-1, keepdims=True)


def images_from_wire(images):
    """Undo the uint8 wire format (`data/pipeline.py::images_to_wire`) on
    device: `uint8 -> float32 / 255.0` reproduces the host's `array / 255.0`
    rounding bit-for-bit, so on-grid pixels are unchanged by the packing
    (see images_to_wire for the native-resize quantization note). float32
    input passes through untouched (tests and library callers that feed
    pre-converted images keep their exact semantics)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def normalize_images(images, grayscale: bool = False):
    """Dataset normalization (`dataloader/dataloader.py:171-201`)."""
    if grayscale:
        if images.shape[-1] == 3:
            images = to_grayscale(images)
        return (images - GRAY_MEAN) / GRAY_STD
    return (images - RGB_MEAN) / RGB_STD


def color_jitter(images, key, brightness: float = 0.1, contrast: float = 0.1):
    """Per-image brightness/contrast jitter on raw [0, 1] images
    (torchvision ColorJitter semantics: factors in [1-x, 1+x])."""
    B = images.shape[0]
    kb, kc = jax.random.split(key)
    b = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    images = jnp.clip(images * b, 0.0, 1.0)
    gray_mean = jnp.mean(to_grayscale(images), axis=(1, 2, 3), keepdims=True)
    return jnp.clip((images - gray_mean) * c + gray_mean, 0.0, 1.0)


def _inverse_affine_coords(out_h, out_w, in_h, in_w, scale, angle_rad, dtype,
                           tx=0.0, ty=0.0):
    """Input-pixel coords for each output pixel of the fixed canvas:
    in = C_in + R(theta) (out - C_out) / scale + t  (see module docstring).
    (tx, ty) is the crop-window offset in INPUT pixels."""
    ys = jnp.arange(out_h, dtype=dtype) - (out_h - 1) / 2.0
    xs = jnp.arange(out_w, dtype=dtype) - (out_w - 1) / 2.0
    gx, gy = jnp.meshgrid(xs, ys)
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    rx = (cos * gx - sin * gy) / scale + (in_w - 1) / 2.0 + tx
    ry = (sin * gx + cos * gy) / scale + (in_h - 1) / 2.0 + ty
    return rx, ry


def pp_shift_for_translation(scale, angle_rad, tx, ty):
    """Principal-point shift induced by a crop-window offset of (tx, ty)
    input pixels: out = C + s R(-theta)(in - C - t), so every projected
    pixel (and thus the principal point) moves by -s R(-theta) t."""
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    dx = -scale * (cos * tx + sin * ty)
    dy = -scale * (-sin * tx + cos * ty)
    return jnp.stack([dx, dy])


def _corner_starts_weights(rx, ry, H, W):
    """Clipped corner-window starts + bilinear weights for a [h', w'] warp.

    Clamping the window start to [0, dim-2] with a saturated tap weight
    reproduces clamped-border bilinear's duplicate-edge-tap arithmetic.
    Returns (starts [h'w', 2] int32, wgt [h'w', 2, 2], inside [h', w'])."""
    x0 = jnp.floor(rx).astype(jnp.int32)
    y0 = jnp.floor(ry).astype(jnp.int32)
    xs = jnp.clip(x0, 0, W - 2)
    ys = jnp.clip(y0, 0, H - 2)
    wx = jnp.clip(rx - xs.astype(rx.dtype), 0.0, 1.0)
    wy = jnp.clip(ry - ys.astype(ry.dtype), 0.0, 1.0)
    starts = jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)
    wxn = wx.reshape(-1)
    wyn = wy.reshape(-1)
    wgt = jnp.stack([1 - wyn, wyn], axis=1)[:, :, None] * jnp.stack(
        [1 - wxn, wxn], axis=1)[:, None, :]  # [h'w', 2, 2]
    inside = (rx >= 0) & (rx <= W - 1) & (ry >= 0) & (ry <= H - 1)
    return starts, wgt, inside


def _bilinear_sample_batch(images, rx, ry, fill):
    """images [B, H, W, C] resampled by a per-batch SHARED warp, gathering
    from a batch-inside [H, W, B*C] re-layout: every output pixel's corner
    window is 4 contiguous [B*C] fragments instead of 4*B C-sized ones —
    ~12x fewer DMA fragments for identical bytes
    (tools/gather_layout_probe.py). The weighted corner sum is the same
    4-term tree as `_bilinear_sample`, so results are bit-exact vs the
    vmapped per-image path (pinned by test)."""
    B, H, W, C = images.shape
    h, w = rx.shape
    starts, wgt, inside = _corner_starts_weights(rx, ry, H, W)
    imgT = jnp.transpose(images, (1, 2, 0, 3)).reshape(H, W, B * C)
    win = jax.lax.gather(
        imgT,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        ),
        slice_sizes=(2, 2, B * C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,  # starts pre-clipped
    )  # [h*w, 2, 2, B*C]
    out = jnp.sum(win * wgt[..., None], axis=(1, 2))  # [h*w, B*C]
    out = out.reshape(h * w, B, C).transpose(1, 0, 2).reshape(B, h, w, C)
    return jnp.where(inside[None, :, :, None], out, fill)


def _bilinear_sample(img, rx, ry, fill):
    """img [H, W, C], rx/ry [h', w'] -> [h', w', C] with OOB fill.

    One lax.gather of [2, 2, C] corner windows instead of four [1, 1, C]
    tap gathers: same sampling math (clamped-border bilinear — the window
    start is clipped to [0, dim-2] and the tap weight saturates, which
    reproduces the duplicate-edge-tap arithmetic), but 4x fewer gather
    slices and 4x larger contiguous reads; the weighted corner sum is a
    broadcasted reduce so no corner-slice retiling pass is emitted.
    Values match the factored four-tap form to 1-2 ulp (the weights are
    distributed). The train-step per-op profile measured the four-tap
    version at ~94 GiB/s (28.5 ms/iter of the B=64 train step); this form
    is DMA-friendly and saved 2.3% of the train step (BENCH_NOTES round 3).
    """
    H, W, C = img.shape
    h, w = rx.shape
    starts, wgt, inside = _corner_starts_weights(rx, ry, H, W)
    win = jax.lax.gather(
        img,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        ),
        slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,  # starts pre-clipped
    )  # [h*w, 2, 2, C]

    # weighted corner sum in the flat [h*w, ...] layout — reshaping the 5-D
    # window tensor to [h, w, 2, 2, C] first costs a full retiling pass
    # (measured 5.9 ms at B=64), and slicing the four corners out costs a
    # kLoop retiling fusion (measured 8.6 ms at B=64); a broadcasted
    # weight-times-window reduce over the tiny (2, 2) dims fuses with the
    # gather consumer instead. The final [h*w, C] -> [h, w, C] reshape is
    # layout-preserving.
    out = jnp.sum(win * wgt[..., None], axis=(1, 2)).reshape(h, w, C)
    return jnp.where(inside[..., None], out, fill)


def _nearest_sample(img, rx, ry, fill):
    """img [H, W, C] nearest-neighbor resample with OOB fill."""
    H, W = img.shape[0], img.shape[1]
    xn = jnp.round(rx).astype(jnp.int32)
    yn = jnp.round(ry).astype(jnp.int32)
    out = img[jnp.clip(yn, 0, H - 1), jnp.clip(xn, 0, W - 1)]
    inside = (xn >= 0) & (xn <= W - 1) & (yn >= 0) & (yn <= H - 1)
    return jnp.where(inside[..., None], out, fill)


def rotation_z_pose(angle_rad, dtype=jnp.float32):
    """In-plane pose rotation appended to the cam-to-world matrix
    (`dataloader/dataloader.py:430-438`)."""
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    return jnp.asarray(
        [[cos, -sin, 0.0, 0.0], [sin, cos, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]],
        dtype,
    )


def augment_batch(
    images,
    labels,
    poses,
    focal,
    key,
    cfg: AugmentConfig = AugmentConfig(),
    semantics: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full train-time augmentation, all on device, static shapes.

    images: [B, H, W, 3] raw [0, 1]; labels: [B, h, w, C] (subsampled) or
    [B, H, W, 1] full-size semantics ids; poses [B, 4, 4]; focal [] or [B].
    Returns (normalized_images, labels, poses, focal, pp_shift); pp_shift
    [2] is the (dx, dy) principal-point offset of the augmented camera
    (zero unless a zoom-in crop window was drawn) — add it to the camera
    matrix used by the loss (`train.TrainBatch.pp_shift`).
    """
    B, H, W, _ = images.shape
    k_scale, k_rot, k_jit, k_tr = jax.random.split(key, 4)
    scale = jax.random.uniform(k_scale, (), minval=cfg.aug_scale_min, maxval=cfg.aug_scale_max)
    angle = jax.random.uniform(k_rot, (), minval=-cfg.aug_rotation, maxval=cfg.aug_rotation)
    angle_rad = jnp.deg2rad(angle)

    if cfg.aug_translation:
        # zoom-in shows a 1/scale window of the source; draw its position
        # uniformly over the feasible range instead of always the center
        # (one shared draw per batch). Zero whenever scale <= 1.
        slack = jnp.maximum(0.0, 1.0 - 1.0 / scale)
        lim = jnp.stack([(W - 1) / 2.0, (H - 1) / 2.0]) * slack
        tx, ty = jax.random.uniform(k_tr, (2,), minval=-1.0, maxval=1.0) * lim
    else:
        tx = ty = jnp.zeros(())

    images = color_jitter(images, k_jit, cfg.aug_brightness, cfg.aug_contrast)
    images = normalize_images(images, cfg.grayscale)

    rx, ry = _inverse_affine_coords(H, W, H, W, scale, angle_rad, images.dtype, tx, ty)
    if cfg.image_gather_bf16:
        images = images.astype(jnp.bfloat16)  # f32 accumulation in the sampler
    if cfg.gather_batch_inside:
        images = _bilinear_sample_batch(images, rx, ry, cfg.nodata_value)
    else:
        images = jax.vmap(lambda im: _bilinear_sample(im, rx, ry, cfg.nodata_value))(images)
    images = images.astype(jnp.float32)

    if semantics:
        fill = 0.0
        lrx, lry = rx, ry  # semantics labels live on the image canvas
    else:
        fill = cfg.nodata_value
        h, w = labels.shape[1], labels.shape[2]
        # label cells live on the subsampled grid; map their pixel centers
        # (x*ss + ss/2) through the same inverse affine; the crop offset is
        # in input pixels, i.e. subsample x label cells
        ss = cfg.subsample
        lrx, lry = _inverse_affine_coords(
            h, w, h, w, scale, angle_rad, images.dtype, tx / ss, ty / ss)
    labels = jax.vmap(lambda lb: _nearest_sample(lb, lrx, lry, fill))(labels)

    poses = poses @ rotation_z_pose(angle_rad, poses.dtype)
    focal = focal * scale
    pp_shift = pp_shift_for_translation(scale, angle_rad, tx, ty)
    return images, labels, poses, focal, pp_shift
