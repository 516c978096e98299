"""Data-layer tests: directory contract, augmentation geometric consistency,
label means, pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import data, geometry as geo, losses


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_scene")
    return data.write_fake_dataset(str(root), n=4, img_h=96, img_w=144, focal=120.0)


class TestCamLocDataset:
    def test_mode1_all_labels(self, fake_root):
        ds = data.CamLocDataset(fake_root, coord=True, depth=True, normal=True, semantics=True)
        assert len(ds) == 4
        it = ds[0]
        assert it.image.shape == (480, 720, 3)  # resized to standard height
        assert it.coord.shape == (12, 18, 3)
        assert it.depth.shape == (12, 18, 1)
        assert it.normal.shape == (12, 18, 3)
        assert it.semantics.shape == (96, 144) and it.semantics.max() <= 5
        assert it.pose.shape == (4, 4)
        # focal rescaled by 480/96 = 5
        np.testing.assert_allclose(it.focal, 120.0 * 5.0)

    def test_multi_root(self, fake_root):
        ds = data.CamLocDataset([fake_root, fake_root], coord=True)
        assert len(ds) == 8

    def test_mode2_eye(self, fake_root):
        ds = data.CamLocDataset(fake_root, mode=2)
        it = ds[0]
        assert it.eye.shape == (12, 18, 3)
        # eye coords must equal w2c(pose) applied to scene coords
        ds1 = data.CamLocDataset(fake_root, mode=1, coord=True)
        it1 = ds1[0]
        w2c = np.asarray(geo.invert_se3(jnp.asarray(it.pose)))
        expect = it1.coord @ w2c[:3, :3].T + w2c[:3, 3]
        np.testing.assert_allclose(it.eye, expect, atol=1e-3)

    def test_collate(self, fake_root):
        ds = data.CamLocDataset(fake_root, coord=True)
        batch = ds.collate([0, 1])
        assert batch["image"].shape == (2, 480, 720, 3)
        assert batch["coord"].shape == (2, 12, 18, 3)
        assert batch["pose"].shape == (2, 4, 4)

    def test_loader(self, fake_root):
        ds = data.CamLocDataset(fake_root, coord=True)
        loader = data.Loader(ds, batch_size=2, shuffle=True)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["image"].shape[0] == 2


class TestAugment:
    def test_pose_focal_affine_exactly_consistent(self, rng):
        """Zero-quantization check: a world point seen at input pixel p must
        project, under the augmented (pose, focal), exactly to the forward
        affine image of p on the fixed canvas."""
        from crossloc_tpu.data.augment import _inverse_affine_coords, rotation_z_pose

        s = data.synth_sample(rng, img_h=192, img_w=256, focal=200.0)
        pose = jnp.asarray(s["pose"])
        H, W = 192, 256
        for seed in range(5):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            scale = float(jax.random.uniform(k1, (), minval=2 / 3, maxval=1.5))
            angle = float(jax.random.uniform(k2, (), minval=-30.0, maxval=30.0))
            rad = np.deg2rad(angle)
            pose_aug = pose @ rotation_z_pose(rad)
            focal_aug = s["focal"] * scale

            # world point seen at label cell (5, 7) of the input
            X = jnp.asarray(s["coord"][5, 7])
            p_in = np.asarray([7 * 8 + 4, 5 * 8 + 4], np.float64)  # pixel center

            # forward affine (index space): out = C + s * R(-theta) (in - C)
            c = np.asarray([(W - 1) / 2, (H - 1) / 2])
            Rm = np.asarray([[np.cos(rad), np.sin(rad)], [-np.sin(rad), np.cos(rad)]])
            # pixel centers (x*8+4) are index+0.5 in index space
            p_out = c + scale * (Rm @ ((p_in - 0.5) - c)) + 0.5

            # project X under the augmented camera
            K = np.asarray(geo.intrinsics(focal_aug, W, H))
            w2c = np.asarray(geo.invert_se3(pose_aug))
            Xc = w2c[:3, :3] @ np.asarray(X) + w2c[:3, 3]
            proj = K @ Xc
            p_proj = proj[0:2] / proj[2]

            np.testing.assert_allclose(p_proj, p_out, atol=0.02)

    def test_translation_pp_shift_exactly_consistent(self, rng):
        """Zoom-in crop-window offsets keep exact geometric consistency:
        a world point seen at input pixel p projects, through the camera
        with the returned principal-point shift, exactly to the forward
        affine image of p (translation included)."""
        from crossloc_tpu.data.augment import _inverse_affine_coords, rotation_z_pose

        s_ = data.synth_sample(rng, img_h=192, img_w=256, focal=200.0)
        pose = jnp.asarray(s_["pose"])
        H, W = 192, 256
        for seed in range(5):
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
            scale = float(jax.random.uniform(k1, (), minval=1.05, maxval=1.5))
            angle = float(jax.random.uniform(k2, (), minval=-30.0, maxval=30.0))
            slack = 1.0 - 1.0 / scale
            t = np.asarray(jax.random.uniform(k3, (2,), minval=-1.0, maxval=1.0)) \
                * np.asarray([(W - 1) / 2, (H - 1) / 2]) * slack
            rad = np.deg2rad(angle)
            pose_aug = pose @ rotation_z_pose(rad)
            focal_aug = s_["focal"] * scale
            pp = np.asarray(data.pp_shift_for_translation(
                jnp.float32(scale), jnp.float32(rad), jnp.float32(t[0]), jnp.float32(t[1])))

            X = jnp.asarray(s_["coord"][5, 7])
            p_in = np.asarray([7 * 8 + 4, 5 * 8 + 4], np.float64)

            # forward affine with crop offset: out = C + s R(-theta)(in - C - t)
            c = np.asarray([(W - 1) / 2, (H - 1) / 2])
            Rm = np.asarray([[np.cos(rad), np.sin(rad)], [-np.sin(rad), np.cos(rad)]])
            p_out = c + scale * (Rm @ ((p_in - 0.5) - c - t)) + 0.5

            K = np.array(geo.intrinsics(focal_aug, W, H), copy=True)
            K[0, 2] += pp[0]
            K[1, 2] += pp[1]
            w2c = np.asarray(geo.invert_se3(pose_aug))
            Xc = w2c[:3, :3] @ np.asarray(X) + w2c[:3, 3]
            proj = K @ Xc
            p_proj = proj[0:2] / proj[2]

            np.testing.assert_allclose(p_proj, p_out, atol=0.05)

    def test_augmented_labels_consistent_within_quantization(self, rng):
        """The coord loss of augmented labels vs themselves under the
        augmented camera stays within nearest-resampling quantization
        (< ~half a subsampled cell diagonal, same as the reference's
        nearest interpolate+rotate)."""
        s = data.synth_sample(rng, img_h=192, img_w=256, focal=200.0)
        B = 2
        images = jnp.asarray(np.stack([s["image"]] * B))
        labels = jnp.asarray(np.stack([s["coord"]] * B))
        poses = jnp.asarray(np.stack([s["pose"]] * B))
        focal = jnp.full((B,), s["focal"])

        for seed in range(4):
            aug_img, aug_lab, aug_pose, aug_focal, pp = data.augment_batch(
                images, labels, poses, focal, jax.random.PRNGKey(seed)
            )
            K = geo.intrinsics(aug_focal[0], 256, 192)
            K = K.at[0, 2].add(pp[0]).at[1, 2].add(pp[1])
            loss, valid_rate = losses.scene_coords_loss(aug_lab, aug_lab, aug_pose, K)
            # per-pixel reprojection error bounded by cell quantization
            assert float(loss) < 8.0, f"seed {seed}: loss={float(loss)}"
            assert float(valid_rate) > 0.3

    def test_fill_values(self, rng):
        images = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)), jnp.float32)
        labels = jnp.ones((1, 8, 8, 3))
        poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
        cfg = data.AugmentConfig(aug_scale_min=0.5, aug_scale_max=0.51)  # zoom out
        img, lab, _, _, _ = data.augment_batch(
            images, labels, poses, jnp.float32(100.0), jax.random.PRNGKey(0), cfg
        )
        # zoom-out maps canvas corners outside the input -> fill value
        np.testing.assert_allclose(np.asarray(img[0, 0, 0]), [-1.0] * 3)
        np.testing.assert_allclose(np.asarray(lab[0, 0, 0]), [-1.0] * 3)

    def test_bf16_image_gather_close_and_labels_untouched(self, rng):
        """image_gather_bf16 rounds only the gathered corner VALUES (f32
        accumulation): images stay within bf16 input rounding of the f32
        path, and labels/poses/focal/pp_shift are bit-identical."""
        images = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 96, 3)), jnp.float32)
        labels = jnp.asarray(rng.normal(size=(2, 8, 12, 3)) * 5, jnp.float32)
        poses = jnp.broadcast_to(jnp.eye(4), (2, 4, 4)).astype(jnp.float32)
        key = jax.random.PRNGKey(3)
        base = data.augment_batch(images, labels, poses, jnp.float32(100.0),
                                  key, data.AugmentConfig())
        fast = data.augment_batch(images, labels, poses, jnp.float32(100.0),
                                  key, data.AugmentConfig(image_gather_bf16=True))
        assert fast[0].dtype == jnp.float32
        # normalized images span ~[-2.6, 2.6]; bf16 relative eps 2^-8
        np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(base[0]),
                                   atol=2.6 * 2.0**-8)
        for got, want in zip(fast[1:], base[1:]):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_batch_inside_gather_bit_exact(self, rng):
        """gather_batch_inside re-lays the gather operand only; every output
        (incl. with bf16 corner reads) is BIT-identical to the per-image
        path — the weighted corner sum is the same 4-term tree."""
        images = jnp.asarray(rng.uniform(0, 1, size=(3, 64, 96, 3)), jnp.float32)
        labels = jnp.asarray(rng.normal(size=(3, 8, 12, 3)) * 5, jnp.float32)
        poses = jnp.broadcast_to(jnp.eye(4), (3, 4, 4)).astype(jnp.float32)
        key = jax.random.PRNGKey(5)
        for bf16 in (False, True):
            base = data.augment_batch(
                images, labels, poses, jnp.float32(100.0), key,
                data.AugmentConfig(image_gather_bf16=bf16))
            alt = data.augment_batch(
                images, labels, poses, jnp.float32(100.0), key,
                data.AugmentConfig(image_gather_bf16=bf16, gather_batch_inside=True))
            for got, want in zip(alt, base):
                np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_normalization_stats(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, size=(2, 8, 8, 3)), jnp.float32)
        n = data.normalize_images(x)
        expect = (np.asarray(x) - data.RGB_MEAN) / data.RGB_STD
        np.testing.assert_allclose(np.asarray(n), expect, rtol=1e-5)
        g = data.normalize_images(x, grayscale=True)
        assert g.shape == (2, 8, 8, 1)

    def test_jitter_bounds(self, rng):
        x = jnp.asarray(rng.uniform(0.3, 0.7, size=(4, 8, 8, 3)), jnp.float32)
        j = data.color_jitter(x, jax.random.PRNGKey(0))
        assert float(jnp.min(j)) >= 0.0 and float(jnp.max(j)) <= 1.0
        assert float(jnp.max(jnp.abs(j - x))) > 0.0


class TestLabelMeans:
    def test_hardcoded(self):
        np.testing.assert_allclose(
            data.get_label_mean("urbanscape", "coord"), [-29.34, 184.17, 91.96]
        )
        np.testing.assert_allclose(data.get_label_mean("naturescape", "depth"), [241.47])
        assert data.get_label_mean("urbanscape", "semantics").shape == (6,)

    def test_normal_logits_round_trip(self):
        from crossloc_tpu.losses import logits_to_radian

        logits = data.get_label_mean("urbanscape", "normal")
        ae = np.asarray(logits_to_radian(jnp.asarray(logits)))
        np.testing.assert_allclose(ae, [-1.0454, -0.9858], atol=1e-3)

    def test_computed_fallback(self, fake_root):
        ds = data.CamLocDataset(fake_root, coord=True)
        mean = data.get_label_mean("unknown_scene", "coord", dataset=ds)
        all_coords = np.concatenate([ds[i].coord.reshape(-1, 3) for i in range(len(ds))])
        np.testing.assert_allclose(mean, all_coords.mean(axis=0), rtol=1e-4)

    def test_unknown_scene_requires_dataset(self):
        with pytest.raises(ValueError):
            data.get_label_mean("unknown_scene", "coord")


class TestDenseFromDepth:
    def test_mode1_dense_generates_exact_coords(self, rng, tmp_path):
        """mode=1, sparse=False: scene coords generated from a depth PNG must
        match the synthetic geometry (dataloader/dataloader.py:444-486)."""
        import imageio.v2 as imageio
        from PIL import Image

        root = tmp_path / "dense_scene"
        for d in ("rgb", "poses", "calibration", "depth"):
            (root / d).mkdir(parents=True)

        # scene with depths < 65 m (16-bit millimeter PNGs saturate at 65.5 m)
        img_h, img_w, focal = 96, 144, 120.0
        h, w = img_h // 8, img_w // 8
        rvec = rng.normal(size=3) * 0.3
        R = np.asarray(geo.rodrigues(jnp.asarray(rvec)))
        t = rng.normal(size=3) * 5 + np.array([0, 0, 30.0])
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R
        pose[:3, 3] = t
        K = np.asarray(geo.intrinsics(focal, img_w, img_h))
        grid = np.asarray(geo.pixel_grid(h, w, 8)).reshape(-1, 2)
        # millimeter-quantized depths so the PNG round trip is exact
        depth = np.round(rng.uniform(5.0, 60.0, size=grid.shape[0]) * 1000) / 1000
        cam_pts = np.asarray(
            geo.backproject(jnp.asarray(grid), jnp.asarray(depth), jnp.asarray(K))
        )
        expected = (cam_pts @ R.T + t).reshape(h, w, 3)

        Image.fromarray(
            (rng.uniform(0, 1, size=(img_h, img_w, 3)) * 255).astype(np.uint8)
        ).save(str(root / "rgb" / "f.png"))
        np.savetxt(str(root / "poses" / "f.txt"), pose)
        np.savetxt(str(root / "calibration" / "f.txt"), [focal])
        full = np.repeat(np.repeat(depth.reshape(h, w), 8, axis=0), 8, axis=1)
        imageio.imwrite(str(root / "depth" / "f.png"),
                        np.round(full * 1000).astype(np.uint16))

        ds = data.CamLocDataset(str(root), mode=1, sparse=False, image_height=96)
        item = ds[0]
        assert item.coord.shape == (h, w, 3)
        err = np.linalg.norm(item.coord - expected, axis=-1)
        assert np.median(err) < 0.01, float(np.median(err))

    def test_mode0_rgb_only(self, rng, tmp_path):
        root = tmp_path / "rgb_scene"
        for d in ("rgb", "poses", "calibration"):
            (root / d).mkdir(parents=True)
        from PIL import Image

        s = data.synth_sample(rng, img_h=48, img_w=64, focal=100.0)
        Image.fromarray((s["image"] * 255).astype(np.uint8)).save(str(root / "rgb" / "f.png"))
        np.savetxt(str(root / "poses" / "f.txt"), s["pose"])
        np.savetxt(str(root / "calibration" / "f.txt"), [s["focal"]])
        ds = data.CamLocDataset(str(root), mode=0, image_height=48)
        item = ds[0]
        assert item.image.shape == (48, 64, 3)
        assert item.coord is None


class TestWireFormat:
    """uint8 wire format for the host->device image link (round 5): 4x
    fewer bytes per batch, exact round trip on the 1/255 pixel grid."""

    def test_round_trip_bit_exact(self):
        import jax.numpy as jnp

        # every decodable pixel value: k/255 with the host's f32 division
        k = np.arange(256, dtype=np.float32)
        host = (k / 255.0).reshape(16, 16, 1).repeat(3, -1)[None]
        wire = data.images_to_wire({"image": host})["image"]
        assert wire.dtype == np.uint8
        assert wire.nbytes == host.nbytes // 4
        back = np.asarray(data.images_from_wire(jnp.asarray(wire)))
        assert back.dtype == np.float32
        assert np.array_equal(back, host)  # bit-exact, not approx

    def test_float_passthrough(self):
        import jax.numpy as jnp

        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 4, 4, 3)),
                        jnp.float32)
        assert data.images_from_wire(x) is x

    def test_non_image_batches_untouched(self):
        b = {"pose": np.eye(4, dtype=np.float32)[None]}
        assert data.images_to_wire(b) is b

    def test_decode_path_unresized_is_bit_exact(self, fake_root):
        # no-resize decode emits k/255 pixels on both the PIL and native
        # paths -> the wire packing is bit-exact for them
        import jax.numpy as jnp

        ds = data.CamLocDataset(str(fake_root), coord=True, image_height=96)
        batch = ds.collate([0])
        back = np.asarray(data.images_from_wire(
            jnp.asarray(data.images_to_wire(batch)["image"])))
        assert np.array_equal(back, batch["image"])

    def test_decode_path_resized_within_half_step(self, fake_root):
        # the native C++ loader resizes in float32; the wire packing then
        # applies the same uint8 quantization PIL's BILINEAR resize (and
        # the reference's torchvision pipeline) applies: <= 1/510 per pixel
        import jax.numpy as jnp

        ds = data.CamLocDataset(str(fake_root), coord=True, image_height=48)
        batch = ds.collate([0])
        back = np.asarray(data.images_from_wire(
            jnp.asarray(data.images_to_wire(batch)["image"])))
        assert np.max(np.abs(back - batch["image"])) <= 0.5 / 255.0 + 1e-7
