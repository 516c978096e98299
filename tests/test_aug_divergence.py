"""Quantified comparison: fixed-canvas device augmentation vs the reference
`batch_resize` (dynamic canvas, `dataloader/dataloader.py:507-586`).

Round-1 review asked for measured numbers instead of the prose claim of
"equivalent distribution". This file carries (a) a numpy oracle of the
reference label path — nearest F.interpolate to ceil(s*H/8) x ceil(s*W/8)
then nearest rotation about the canvas center with fill — and (b) tests
that measure, across the full (scale, angle) augmentation range:

  1. valid-label-cell COUNT per image (what the per-pixel-mean loss sees),
  2. content retention (fraction of source cells visible in the output),
  3. end-of-training convergence A/B on identical synthetic data.

Measured results are recorded in AUG_NOTES.md; the assertions here pin the
bounds so regressions are caught.

Note on poses: the reference's batch path NEVER rotation-compensates poses
(`batch_resize` returns `torch.stack(b_pose)` unmodified; the per-sample
pose update `dataloader.py:430-438` runs with angle=0 when batch=True).
This framework applies the pose rotation in batch mode too — the
geometrically-correct behavior the reference itself implements for
batch_size=1. The A/B below therefore applies pose rotation in both arms
to isolate the one real divergence: canvas policy.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import data, losses
from crossloc_tpu.data.augment import AugmentConfig, _inverse_affine_coords


# ---------------------------------------------------------------- oracle --

def _torch_nearest_resize_idx(out_n: int, in_n: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') source index per output index."""
    return np.minimum((np.arange(out_n) * (in_n / out_n)).astype(np.int64), in_n - 1)


def _rotate_nearest_src(out_h: int, out_w: int, angle_rad: float):
    """Inverse-rotation source indices about the canvas center (torchvision
    F.rotate nearest); returns (ry, rx) float arrays on the same canvas."""
    ys = np.arange(out_h) - (out_h - 1) / 2.0
    xs = np.arange(out_w) - (out_w - 1) / 2.0
    gx, gy = np.meshgrid(xs, ys)
    cos, sin = np.cos(angle_rad), np.sin(angle_rad)
    rx = cos * gx - sin * gy + (out_w - 1) / 2.0
    ry = sin * gx + cos * gy + (out_h - 1) / 2.0
    return ry, rx


def ref_batch_resize_labels(labels: np.ndarray, scale: float, angle_deg: float,
                            subsample: int = 8, fill: float = -1.0):
    """Reference label path (`dataloader.py:533-546`): dynamic canvas.

    labels [B, h, w, C] -> [B, ceil(s*H/ss), ceil(s*W/ss), C] where
    H = h*ss. Two-stage nearest resampling, exactly like
    F.interpolate(nearest) followed by torchvision rotate(NEAREST, fill).
    Also returns the integer source-cell index maps for retention stats.
    """
    B, h, w, C = labels.shape
    H, W = h * subsample, w * subsample
    img_h, img_w = int(np.ceil(H * scale)), int(np.ceil(W * scale))
    ch, cw = int(np.ceil(img_h / subsample)), int(np.ceil(img_w / subsample))

    iy = _torch_nearest_resize_idx(ch, h)
    ix = _torch_nearest_resize_idx(cw, w)
    resized = labels[:, iy][:, :, ix]  # [B, ch, cw, C]

    ry, rx = _rotate_nearest_src(ch, cw, np.deg2rad(angle_deg))
    yn, xn = np.round(ry).astype(np.int64), np.round(rx).astype(np.int64)
    inside = (yn >= 0) & (yn < ch) & (xn >= 0) & (xn < cw)
    ync, xnc = np.clip(yn, 0, ch - 1), np.clip(xn, 0, cw - 1)
    out = resized[:, ync, xnc]
    out = np.where(inside[None, :, :, None], out, fill).astype(labels.dtype)

    # composed source-cell map (for retention): output cell -> input cell
    src_y = np.where(inside, iy[ync], -1)
    src_x = np.where(inside, ix[xnc], -1)
    return out, (src_y, src_x)


def ours_label_src(h: int, w: int, scale: float, angle_deg: float,
                   tx: float = 0.0, ty: float = 0.0):
    """Our fixed-canvas nearest source map on the label grid; (tx, ty) is
    the crop-window offset in label cells."""
    rx, ry = _inverse_affine_coords(h, w, h, w, jnp.float32(scale),
                                    jnp.deg2rad(jnp.float32(angle_deg)), jnp.float32,
                                    jnp.float32(tx), jnp.float32(ty))
    rx, ry = np.asarray(rx, np.float64), np.asarray(ry, np.float64)
    yn, xn = np.round(ry).astype(np.int64), np.round(rx).astype(np.int64)
    inside = (yn >= 0) & (yn < h) & (xn >= 0) & (xn < w)
    return np.where(inside, yn, -1), np.where(inside, xn, -1)


def _retention(src_y, src_x, h, w) -> float:
    """Fraction of the h*w input cells referenced by >= 1 output cell."""
    valid = src_y >= 0
    flat = src_y[valid] * w + src_x[valid]
    return len(np.unique(flat)) / float(h * w)


SCALES = np.linspace(2 / 3, 3 / 2, 13)
ANGLES = (0.0, 15.0, 30.0)
H, W, SS = 480, 720, 8
h, w = H // SS, W // SS


def _sweep():
    """(scale, angle) -> dict of per-scheme valid counts and retention."""
    rows = []
    ones = np.ones((1, h, w, 1), np.float32)
    for s in SCALES:
        for a in ANGLES:
            ref_lab, (ref_sy, ref_sx) = ref_batch_resize_labels(ones, s, a, SS)
            ref_valid = int(np.sum(ref_lab[0, :, :, 0] != -1.0))
            our_sy, our_sx = ours_label_src(h, w, s, a)
            our_valid = int(np.sum(our_sy >= 0))
            rows.append(dict(
                scale=s, angle=a,
                ref_valid=ref_valid, our_valid=our_valid,
                ref_ret=_retention(ref_sy, ref_sx, h, w),
                our_ret=_retention(our_sy, our_sx, h, w),
            ))
    return rows


class TestAugDivergence:
    def test_valid_cell_count(self):
        """Valid (loss-contributing) cell counts follow the analytic model
        (measured numbers in AUG_NOTES.md): at zoom-out BOTH schemes keep
        ~s^2*h*w valid cells (the dynamic canvas shrinks, the fixed canvas
        pads); at zoom-in the dynamic canvas grows to ~s^2*h*w cells while
        the fixed canvas saturates at h*w. The per-pixel-MEAN loss reduction
        is unaffected by the count; gradient-sample counts differ only at
        zoom-in."""
        rows = _sweep()
        for r in rows:
            if r["angle"] != 0.0:
                continue
            s = r["scale"]
            assert abs(r["ref_valid"] - s * s * h * w) / (s * s * h * w) < 0.05
            expect_ours = min(1.0, s * s) * h * w
            assert abs(r["our_valid"] - expect_ours) / expect_ours < 0.07
        # rotation only ever removes cells (corner fill), on both canvases
        by_sa = {(r["scale"], r["angle"]): r for r in rows}
        for s in SCALES:
            assert by_sa[(s, 30.0)]["ref_valid"] <= by_sa[(s, 0.0)]["ref_valid"]
            assert by_sa[(s, 30.0)]["our_valid"] <= by_sa[(s, 0.0)]["our_valid"] + 2

    def test_content_retention(self):
        """Where the schemes genuinely differ (AUG_NOTES.md): at zoom-out
        both discard the same ~(1-s^2) of cells to downsampling; at zoom-in
        the dynamic canvas retains everything while a fixed-canvas crop
        retains ~1/s^2 per draw. Measured means over the sweep grid:
        ref 0.758, ours 0.632; Monte-Carlo over the true training
        distribution: ref 0.777, ours 0.638."""
        rows = _sweep()
        for r in rows:
            if r["angle"] != 0.0:
                continue
            s = r["scale"]
            if s <= 1.0:  # zoom-out: both ~ s^2, identical discard
                assert abs(r["ref_ret"] - s * s) < 0.05
                assert abs(r["our_ret"] - s * s) < 0.05
            else:  # zoom-in: ref keeps all, ours keeps the 1/s^2 window
                assert r["ref_ret"] == 1.0
                assert abs(r["our_ret"] - 1.0 / (s * s)) < 0.08
        ref_mean = float(np.mean([r["ref_ret"] for r in rows]))
        our_mean = float(np.mean([r["our_ret"] for r in rows]))
        assert 0.70 < ref_mean < 0.85 and 0.55 < our_mean < 0.72

    def test_random_offset_removes_center_bias(self):
        """The zoom-in crop window is drawn uniformly (augment_batch
        aug_translation), so per-cell high-resolution visibility is spread
        over the whole image instead of center-only: with a CENTER crop at
        s=1.4 the outermost border cells are never sampled; with random
        offsets every cell has nonzero visibility across draws (measured:
        at s=1.4, 500 draws: never-seen cell fraction 25.4% center crop vs
        0.5% random offset — AUG_NOTES.md)."""
        rng = np.random.default_rng(3)
        s = 1.4
        vis_center = np.zeros((h, w))
        vis_rand = np.zeros((h, w))
        draws = 500
        lim_y = (h - 1) / 2.0 * (1 - 1 / s)
        lim_x = (w - 1) / 2.0 * (1 - 1 / s)
        for _ in range(draws):
            a = rng.uniform(-30, 30)
            sy, sx = ours_label_src(h, w, s, a)
            m = sy >= 0
            vis_center[sy[m], sx[m]] += 1
            ty, tx = rng.uniform(-lim_y, lim_y), rng.uniform(-lim_x, lim_x)
            sy, sx = ours_label_src(h, w, s, a, tx, ty)
            m = sy >= 0
            vis_rand[sy[m], sx[m]] += 1
        # center crop: a quarter of the image is NEVER seen at this zoom;
        # random offset: all but the extreme corners are
        assert (vis_center == 0).mean() > 0.20
        assert (vis_rand == 0).mean() < 0.02
        assert np.percentile(vis_rand, 5) / draws > 0.01

    @pytest.mark.slow
    def test_convergence_ab(self, rng):
        """Training-equivalence: identical tiny-net training on the same
        synthetic frames, our device augmentation vs reference-semantics
        (dynamic canvas) augmentation, same (scale, angle) draws. Final
        held-out coord loss must land in the same regime.

        Measured values are recorded in AUG_NOTES.md."""
        from crossloc_tpu import models, train

        B, Ht, Wt = 2, 48, 64
        samples = [data.synth_sample(rng, img_h=Ht, img_w=Wt, focal=60.0)
                   for _ in range(B)]
        images = np.stack([s["image"] for s in samples])
        labels = np.stack([s["coord"] for s in samples])
        poses = np.stack([s["pose"] for s in samples])
        focal = 60.0

        # discrete draw set keeps the dynamic-canvas arm to 4 XLA shapes
        draw_scales = [0.7, 0.9, 1.15, 1.4]
        draw_angles = [-20.0, 0.0, 10.0, 25.0]
        steps = 400
        order = rng.integers(0, 4, size=steps)

        from crossloc_tpu.data.augment import (
            _bilinear_sample, _nearest_sample, normalize_images, rotation_z_pose)

        hl, wl = labels.shape[1], labels.shape[2]

        def fixed_canvas_aug(s, a):
            """Our scheme with the (scale, angle) draw pinned."""
            rad = jnp.deg2rad(jnp.float32(a))
            img = normalize_images(jnp.asarray(images))
            rx, ry = _inverse_affine_coords(Ht, Wt, Ht, Wt, jnp.float32(s), rad, jnp.float32)
            img = jax.vmap(lambda im: _bilinear_sample(im, rx, ry, -1.0))(img)
            lrx, lry = _inverse_affine_coords(hl, wl, hl, wl, jnp.float32(s), rad, jnp.float32)
            lab = jax.vmap(lambda lb: _nearest_sample(lb, lrx, lry, -1.0))(jnp.asarray(labels))
            pose = jnp.asarray(poses, jnp.float32) @ rotation_z_pose(rad)
            return img, lab, pose, jnp.float32(focal * s)

        def dynamic_canvas_aug(s, a):
            """Reference scheme (dynamic canvas), pose-rotated like ours."""
            lab_np, _ = ref_batch_resize_labels(labels, s, a, SS)
            img_np = _ref_resize_rotate_images(
                np.asarray(normalize_images(jnp.asarray(images))), s, a)
            pose = jnp.asarray(poses, jnp.float32) @ rotation_z_pose(
                jnp.deg2rad(jnp.float32(a)))
            return (jnp.asarray(img_np), jnp.asarray(lab_np), pose,
                    jnp.float32(focal * s))

        def val_loss(model, params):
            val_img = jnp.asarray(normalize_images(jnp.asarray(images)))
            preds = model.apply({"params": params}, val_img)
            K = jnp.asarray(np.asarray(
                [[focal, 0, Wt / 2], [0, focal, Ht / 2], [0, 0, 1]], np.float32))
            loss, _ = losses.scene_coords_loss(
                preds[..., 0:3], jnp.asarray(labels),
                jnp.asarray(poses, jnp.float32), K)
            return float(loss)

        def train_arm(scheme):
            model = models.build_network(
                "coord", tiny=True, mean=list(np.mean(labels, axis=(0, 1, 2))))
            tx = train.make_optimizer(2e-3)
            state = train.create_train_state(model, tx, jnp.zeros((B, Ht, Wt, 3)))
            init = val_loss(model, state.params)
            step = jax.jit(train.make_train_step(model, tx, "coord"))
            aug = fixed_canvas_aug if scheme == "fixed" else dynamic_canvas_aug
            for i in range(steps):
                s, a = draw_scales[order[i]], draw_angles[order[i]]
                img, lab, pose_j, focal_j = aug(s, a)
                batch = train.TrainBatch(img, pose_j, lab, focal_j)
                state, _ = step(state, batch)
            return val_loss(model, state.params), init

        fixed, init = train_arm("fixed")
        dynamic, _ = train_arm("dynamic")
        print(f"\nconvergence A/B: init={init:.2f} fixed={fixed:.2f} "
              f"dynamic={dynamic:.2f} ratio={fixed / dynamic:.3f}")
        assert np.isfinite(fixed) and np.isfinite(dynamic)
        # both arms must have genuinely trained (the frames are random
        # textures, so learning = memorization and is deliberately slow),
        # and must land in the same regime
        assert fixed < 0.88 * init, (fixed, init)
        assert dynamic < 0.88 * init, (dynamic, init)
        assert 0.85 < fixed / dynamic < 1.18, (fixed, dynamic, init)


def _ref_resize_rotate_images(images: np.ndarray, scale: float, angle_deg: float):
    """Reference image path: bilinear resize to the dynamic canvas
    (align_corners=False) then bilinear rotation with fill -1."""
    B, H, W, C = images.shape
    out_h, out_w = int(np.ceil(H * scale)), int(np.ceil(W * scale))
    ry, rx = _rotate_nearest_src(out_h, out_w, np.deg2rad(angle_deg))
    # compose with the inverse of the resize (align_corners=False)
    sy = (ry + 0.5) * (H / out_h) - 0.5
    sx = (rx + 0.5) * (W / out_w) - 0.5
    inside = (sy >= 0) & (sy <= H - 1) & (sx >= 0) & (sx <= W - 1)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, W - 1)
    y1, x1 = np.minimum(y0 + 1, H - 1), np.minimum(x0 + 1, W - 1)
    wy, wx = (sy - y0)[..., None], (sx - x0)[..., None]
    out = np.empty((B, out_h, out_w, C), images.dtype)
    for b in range(B):
        im = images[b]
        top = im[y0, x0] * (1 - wx) + im[y0, x1] * wx
        bot = im[y1, x0] * (1 - wx) + im[y1, x1] * wx
        out[b] = top * (1 - wy) + bot * wy
    return np.where(inside[None, :, :, None], out, -1.0).astype(images.dtype)
