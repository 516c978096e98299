"""Model-family tests: shapes, freezing semantics, heads, pixel shuffle."""
import numpy as np

import jax
import jax.numpy as jnp

from crossloc_tpu import models


def init_and_run(model, x, key=0):
    params = model.init(jax.random.PRNGKey(key), x)
    return params, model.apply(params, x)


class TestTransPoseNet:
    def test_coord_mle_shapes(self, rng):
        net = models.build_network("coord", uncertainty="MLE", mean=[1.0, 2.0, 3.0])
        x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), dtype=jnp.float32)
        params, out = init_and_run(net, x)
        assert out.shape == (2, 8, 12, 4)  # 3 task + 1 uncertainty, /8
        unc = np.asarray(out[..., 3])
        assert unc.min() >= 1e-7 and unc.max() <= 1e6 + 1

    def test_mean_offset_applied(self, rng):
        x = jnp.zeros((1, 32, 32, 3))
        net0 = models.build_network("coord", mean=[0.0, 0.0, 0.0])
        params = net0.init(jax.random.PRNGKey(0), x)
        out0 = net0.apply(params, x)
        # inject a different mean into the same params
        p2 = jax.tree_util.tree_map(lambda a: a, params)
        p2["params"]["decoder"]["mean"] = jnp.asarray([100.0, -50.0, 7.0])
        out1 = net0.apply(p2, x)
        np.testing.assert_allclose(
            np.asarray(out1 - out0), np.broadcast_to([100.0, -50.0, 7.0], out0.shape),
            atol=1e-4,
        )

    def test_task_channel_table(self):
        assert models.task_channels("coord") == 3
        assert models.task_channels("normal") == 2
        assert models.task_channels("depth") == 1
        assert models.task_channels("semantics") == 6

    def test_fullsize_semantics(self, rng):
        net = models.build_network("semantics", fullsize=True)
        x = jnp.asarray(rng.normal(size=(1, 48, 72, 3)), dtype=jnp.float32)
        _, out = init_and_run(net, x)
        assert out.shape == (1, 48, 72, 6)

    def test_mlr_composition_and_freezing(self, rng):
        net = models.build_network("coord", uncertainty="MLE", num_mlr=3,
                                   num_unfrozen_encoder=1)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        names = set(params["params"].keys())
        assert {"mlr_encoder_1", "mlr_encoder_2", "mlr_encoder_3",
                "mlr_skip", "mlr_norm", "mlr_forward", "decoder"} <= names
        assert "encoder" not in names

        def loss_fn(p):
            return jnp.sum(net.apply({"params": p}, x) ** 2)

        g = jax.grad(loss_fn)(params["params"])
        g_frozen = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["mlr_encoder_2"], 0.0
        )
        g_live = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["mlr_encoder_1"], 0.0
        )
        g_dec = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["decoder"], 0.0
        )
        assert g_frozen == 0.0  # stop_gradient freezing
        assert g_live > 0.0 and g_dec > 0.0

    def test_mean_never_trains(self, rng):
        net = models.build_network("coord", mean=[1.0, 2.0, 3.0])
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(net.apply({"params": p}, x)))(params["params"])
        assert float(jnp.sum(jnp.abs(g["decoder"]["mean"]))) == 0.0

    def test_tiny_variant(self, rng):
        net = models.build_network("depth", tiny=True)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), dtype=jnp.float32)
        params, out = init_and_run(net, x)
        assert out.shape == (1, 4, 4, 1)
        # tiny: no res2_skip layer in the encoder
        assert "res2_skip" not in params["params"]["encoder"]


class TestVanillaNetwork:
    def test_shapes_and_mean(self, rng):
        net = models.VanillaNetwork(mean_init=[10.0, 20.0, 30.0])
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 1)), dtype=jnp.float32)
        params, out = init_and_run(net, x)
        assert out.shape == (1, 8, 8, 3)


class TestProjHead:
    def test_vector_output(self, rng):
        head = models.ProjHead(out_length=256)
        x = jnp.asarray(rng.normal(size=(2, 60, 90, 512)), dtype=jnp.float32)
        _, out = init_and_run(head, x)
        assert out.shape == (2, 256)


class TestPixelShuffle:
    def test_matches_torch_semantics(self, rng):
        import torch

        x = rng.normal(size=(2, 3, 4, 2 * 2 * 5)).astype(np.float32)
        ours = np.asarray(models.pixel_shuffle(jnp.asarray(x), 2))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        theirs = torch.pixel_shuffle(xt, 2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=0)

    def test_bilinear_resize_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.normal(size=(1, 6, 8, 3)).astype(np.float32)
        ours = np.asarray(models.bilinear_resize(jnp.asarray(x), 13, 17))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = (
            F.interpolate(xt, (13, 17), mode="bilinear", align_corners=False)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestRemat:
    def test_remat_same_outputs_and_grads(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
        m0 = models.build_network("coord", mean=[0.0, 0.0, 0.0])
        m1 = models.build_network("coord", mean=[0.0, 0.0, 0.0], remat=True)
        p = m0.init(jax.random.PRNGKey(0), x)
        y0 = m0.apply(p, x)
        y1 = m1.apply(p, x)  # same param tree: remat is compute-only
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
        g0 = jax.grad(lambda pp: jnp.sum(m0.apply(pp, x) ** 2))(p)
        g1 = jax.grad(lambda pp: jnp.sum(m1.apply(pp, x) ** 2))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestShardedForward:
    def test_spatial_sharded_forward_matches_replicated(self, rng):
        """XLA SPMD halo exchanges (3x3 convs) + cross-shard GroupNorm
        statistics must reproduce the unsharded forward exactly."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from crossloc_tpu import parallel

        net = models.build_network("coord", uncertainty="MLE", mean=[1.0, 2.0, 3.0])
        x = jnp.asarray(rng.normal(size=(4, 64, 96, 3)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        fwd = jax.jit(net.apply)
        ref = np.asarray(fwd(params, x))

        mesh = parallel.make_mesh(jax.devices(), data=4, spatial=2)
        with mesh:
            xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
            ps = parallel.replicate(mesh, params)
            out = np.asarray(fwd(ps, xs))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


class TestStemS2D:
    def test_s2d_stems_match_standard_path(self, rng):
        """space-to-depth stems are an exact re-expression: same param tree,
        same output (to float reassociation) as the standard ConvGN stems."""
        net_std = models.build_network("coord", uncertainty="MLE",
                                       mean=[1.0, 2.0, 3.0])
        net_s2d = models.build_network("coord", uncertainty="MLE",
                                       mean=[1.0, 2.0, 3.0], stem_s2d=True)
        x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
        params = net_std.init(jax.random.PRNGKey(0), x)
        params_s2d = net_s2d.init(jax.random.PRNGKey(0), x)
        # identical param trees (the .net checkpoint contract)
        flat_a = jax.tree_util.tree_structure(params)
        flat_b = jax.tree_util.tree_structure(params_s2d)
        assert flat_a == flat_b
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_s2d)):
            assert a.shape == b.shape

        ref = np.asarray(jax.jit(net_std.apply)(params, x))
        got = np.asarray(jax.jit(net_s2d.apply)(params, x))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-4 * max(scale, 1.0), rtol=1e-4)

    def test_s2d_odd_shape_falls_back(self, rng):
        net = models.build_network("coord", uncertainty="MLE",
                                   mean=[0.0, 0.0, 0.0], stem_s2d=True)
        x = jnp.asarray(rng.normal(size=(1, 63, 95, 3)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert np.isfinite(np.asarray(out)).all()

    def test_s2d_gradients_flow(self, rng):
        net = models.build_network("coord", uncertainty="MLE",
                                   mean=[0.0, 0.0, 0.0], stem_s2d=True)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.sum(jnp.square(net.apply(p, x)[..., :3]))

        g = jax.grad(loss)(params)
        k1 = g["params"]["encoder"]["stem1"]["conv"]["kernel"]
        assert float(jnp.max(jnp.abs(k1))) > 0.0


class TestBF16Compute:
    """Accuracy gate for the `--bf16` CLI flag (bench.py's configuration):
    conv compute in bfloat16, params / GroupNorm statistics / outputs f32."""

    def _deviation(self, rng, tiny, hw=(96, 144)):
        mean = [-29.34, 184.17, 91.96]  # urbanscape coord scale (means.py)
        x = jnp.asarray(rng.normal(size=(2, *hw, 3)), jnp.float32)
        m32 = models.build_network("coord", uncertainty="MLE", tiny=tiny,
                                   mean=mean, dtype=jnp.float32)
        m16 = models.build_network("coord", uncertainty="MLE", tiny=tiny,
                                   mean=mean, dtype=jnp.bfloat16)
        params = m32.init(jax.random.PRNGKey(0), x)  # same f32 params
        y32 = np.asarray(m32.apply(params, x))
        y16 = np.asarray(m16.apply(params, x))
        assert y16.dtype == np.float32  # decoder casts outputs back to f32
        return y32, y16

    def test_bf16_forward_close_to_f32(self, rng):
        y32, y16 = self._deviation(rng, tiny=True)
        c32, c16 = y32[..., :3], y16[..., :3]
        # coord deviation must be noise relative to the output spread
        # (measured 0.06% on this config; solver-side prediction noise on
        # real nets is meters, vs centimeters here)
        rel = np.abs(c32 - c16).max() / (c32.std() + 1e-9)
        assert rel < 0.02, rel
        # uncertainty channel: multiplicative deviation only
        dlog = np.abs(np.log(y16[..., 3] + 1e-12) - np.log(y32[..., 3] + 1e-12))
        assert dlog.max() < 0.2, dlog.max()

    def test_bf16_forward_close_to_f32_standard(self, rng):
        y32, y16 = self._deviation(rng, tiny=False, hw=(64, 96))
        c32, c16 = y32[..., :3], y16[..., :3]
        rel = np.abs(c32 - c16).max() / (c32.std() + 1e-9)
        assert rel < 0.02, rel
