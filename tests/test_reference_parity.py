"""Golden cross-implementation parity: the ACTUAL reference torch model vs
our flax model with converted weights, same inputs, near-identical outputs.

This is the strongest checkpoint-compatibility evidence available without
the CrossLoc dataset: random reference weights -> `.net` state dict ->
`compat.torch_state_to_params` -> flax forward must reproduce the reference
forward numerically (conv padding, GroupNorm eps/grouping, DUC pixel
shuffle, bilinear trim, mean offset, uncertainty squash).

The reference is imported read-only from /root/reference with its CUDA calls
and gitpython dependency neutralized; tests skip if it is unavailable.
"""
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from crossloc_tpu import compat, models

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def refnets():
    torch = pytest.importorskip("torch")
    import os

    if not os.path.isdir(REF_PATH):
        pytest.skip("reference repo not mounted")
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only torch
    sys.modules.setdefault("git", types.SimpleNamespace(Repo=lambda *a, **k: None))
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from networks import networks as refnetworks  # noqa: read-only import

    return refnetworks


def _compare(ref_module, our_model, x_nchw, atol):
    import torch

    ref_module.eval()
    with torch.no_grad():
        ref_out = ref_module(torch.from_numpy(x_nchw)).numpy()
    params = compat.torch_state_to_params(ref_module.state_dict(), our_model)
    ours = np.asarray(
        our_model.apply({"params": params}, jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
    )
    ref_nhwc = np.transpose(ref_out, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref_nhwc, atol=atol, rtol=1e-4)
    return ours


class TestReferenceForwardParity:
    def test_transpose_net_coord_mle(self, refnets, rng):
        import torch

        torch.manual_seed(0)
        ref = refnets.TransPoseNet(
            torch.zeros(3), tiny=False, grayscale=False,
            enc_add_res_block=2, dec_add_res_block=2,
            num_task_channel=3, num_pos_channel=1,
        )
        ours = models.build_network("coord", uncertainty="MLE", mean=[0.0, 0.0, 0.0])
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        _compare(ref, ours, x, atol=2e-4)

    def test_transpose_net_tiny_depth(self, refnets, rng):
        import torch

        torch.manual_seed(1)
        ref = refnets.TransPoseNet(
            torch.zeros(1), tiny=True, grayscale=False,
            enc_add_res_block=2, dec_add_res_block=2,
            num_task_channel=1, num_pos_channel=1,
        )
        ours = models.build_network("depth", uncertainty="MLE", tiny=True, mean=[0.0])
        x = rng.normal(size=(2, 3, 48, 64)).astype(np.float32)
        _compare(ref, ours, x, atol=2e-4)

    def test_transpose_net_mlr(self, refnets, rng):
        import torch

        torch.manual_seed(2)
        ref = refnets.TransPoseNet(
            torch.zeros(3), tiny=True, grayscale=False,
            enc_add_res_block=2, dec_add_res_block=2,
            num_task_channel=3, num_pos_channel=1,
            num_mlr=3, num_unfrozen_encoder=1,
        )
        ours = models.build_network(
            "coord", uncertainty="MLE", tiny=True, num_mlr=3, num_unfrozen_encoder=1,
            mean=[0.0, 0.0, 0.0],
        )
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        _compare(ref, ours, x, atol=3e-4)

    def test_fullsize_semantics_duc(self, refnets, rng):
        import torch

        torch.manual_seed(3)
        ref = refnets.TransPoseNet(
            torch.zeros(6), tiny=True, grayscale=False,
            enc_add_res_block=2, dec_add_res_block=2,
            num_task_channel=6, num_pos_channel=0, full_size_output=True,
        )
        ours = models.build_network("semantics", tiny=True, fullsize=True)
        x = rng.normal(size=(1, 3, 40, 56)).astype(np.float32)
        _compare(ref, ours, x, atol=3e-4)

    def test_vanilla_network(self, refnets, rng):
        import torch

        torch.manual_seed(4)
        ref = refnets.Network(torch.zeros(3), tiny=False)
        ours = models.VanillaNetwork(mean_init=[0.0, 0.0, 0.0])
        x = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)
        _compare(ref, ours, x, atol=2e-4)

    def test_mean_offset_round_trips(self, refnets, rng):
        """A nonzero learned mean buffer must survive conversion."""
        import torch

        torch.manual_seed(5)
        ref = refnets.TransPoseNet(
            torch.tensor([10.0, -5.0, 100.0]), tiny=True, grayscale=False,
            enc_add_res_block=2, dec_add_res_block=2,
            num_task_channel=3, num_pos_channel=0,
        )
        ours = models.build_network("coord", tiny=True, mean=[0.0, 0.0, 0.0])
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        _compare(ref, ours, x, atol=2e-4)
