"""Pallas fused GroupNorm kernel tests (CPU fallback path here; the Pallas
path itself is exercised on TPU by bench/entry and was validated on-chip)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu.ops import groupnorm_relu
from crossloc_tpu.ops.pallas_groupnorm import _gn_reference


class TestGroupNormFused:
    def test_matches_torch_groupnorm(self, rng):
        import torch

        C, G = 256, 32
        x = rng.normal(size=(2, 6, 6, C)).astype(np.float32)
        w = rng.normal(size=C).astype(np.float32)
        b = rng.normal(size=C).astype(np.float32)
        ours = np.asarray(
            groupnorm_relu(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), G, 1e-5, False)
        )
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.group_norm(tx, G, torch.from_numpy(w), torch.from_numpy(b))
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=2e-5)

    def test_relu_fused(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 128)), jnp.float32)
        w = jnp.ones(128)
        b = jnp.zeros(128)
        y = groupnorm_relu(x, w, b, 32, 1e-5, True)
        assert float(jnp.min(y)) >= 0.0

    def test_grad_matches_reference(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 128)), jnp.float32)
        w = jnp.asarray(rng.normal(size=128), jnp.float32)
        b = jnp.asarray(rng.normal(size=128), jnp.float32)

        g1 = jax.grad(lambda x, w, b: jnp.sum(groupnorm_relu(x, w, b, 32) ** 2), (0, 1, 2))(x, w, b)
        g2 = jax.grad(lambda x, w, b: jnp.sum(_gn_reference(x, w, b, 32, 1e-5, True) ** 2), (0, 1, 2))(x, w, b)
        # same math; differences are fp32 fusion-order noise amplified by x^2
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-3)

    def test_shape_guard(self, rng):
        with pytest.raises(ValueError):
            groupnorm_relu(jnp.zeros((1, 2, 2, 128)), jnp.ones(64), jnp.zeros(64), 32)

    def test_pallas_opt_in_flag(self):
        from crossloc_tpu.ops import set_pallas_enabled
        from crossloc_tpu.ops.pallas_groupnorm import _eligible

        x = jnp.zeros((1, 8, 8, 256))
        set_pallas_enabled(True)
        # still False on CPU (backend gate), but the flag flips the first gate
        assert _eligible(x, 32) == (jax.default_backend() == "tpu")
        set_pallas_enabled(False)
        assert not _eligible(x, 32)
