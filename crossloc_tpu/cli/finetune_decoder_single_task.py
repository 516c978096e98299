"""Fine-tune a task decoder on top of frozen MLR encoders (CrossLoc stage).

Arg-compatible with the reference `finetune_decoder_single_task.py`
(`:59-81` for the encoder wiring flags, `:159-221` for the naming grammar).
The coord pretrain weight initializes the decoder; each task pretrain weight
fills one MLR encoder tower; freezing is structural (stop_gradient) rather
than `requires_grad=False`.
"""
from __future__ import annotations

import argparse
import logging
import os

import jax

from .. import compat
from ..utils import check_encoders, config_log
from . import common
from .train_single_task import config_parser, normalize_opt, run_training


def _extend_parser(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument(
        "--encoders", nargs="+", required=True,
        help="pretrained encoders to concatenate, e.g. coord depth normal [semantics]",
    )
    parser.add_argument("--coord_weight", type=str, default=None)
    parser.add_argument("--depth_weight", type=str, default=None)
    parser.add_argument("--normal_weight", type=str, default=None)
    parser.add_argument("--semantics_weight", type=str, default=None)
    parser.add_argument("--reuse_coord_encoder", action="store_true",
                        help="reuse the coord pretrain encoder as an MLR encoder")
    parser.add_argument("--unfreeze_coord_encoder", action="store_true",
                        help="let the reused coord encoder keep training")
    return parser


def get_output_path(opt, project_dir=None):
    name = compat.finetune_output_name(
        opt.scene, opt.task, opt.encoders,
        reuse_coord_encoder=opt.reuse_coord_encoder,
        unfreeze_coord_encoder=opt.unfreeze_coord_encoder,
        session=opt.session, grayscale=opt.grayscale, uncertainty=opt.uncertainty,
        fullsize=opt.fullsize, epochs=opt.epochs, learning_rate=opt.learningrate,
        real_data_chunk=opt.real_data_chunk, sim_data_chunk=opt.sim_data_chunk,
        real_data_domain=opt.real_data_domain, real_only=opt.real_only,
        tiny=opt.tiny, network_in=opt.network_in, debug=opt.debug,
        e2e=getattr(opt, "e2e_pose_loss", False),
        bf16=getattr(opt, "bf16", False),
    )
    project_dir = project_dir or os.getcwd()
    return os.path.abspath(os.path.join(project_dir, "output", name))


def main(argv=None):
    parser = _extend_parser(config_parser("Fine-tune a task decoder over frozen MLR encoders."))
    opt = normalize_opt(parser.parse_args(argv))
    from ..parallel import initialize_distributed

    initialize_distributed()  # no-op unless multi-host env is set

    encoder_paths = check_encoders(
        list(opt.encoders), opt.coord_weight, opt.depth_weight, opt.normal_weight,
        opt.semantics_weight,
    )
    if opt.reuse_coord_encoder:
        num_mlr = len(encoder_paths)
    else:
        assert not opt.unfreeze_coord_encoder
        num_mlr = len(encoder_paths) - 1  # coord weight only initializes the decoder

    from .train_single_task import _process_topology

    output_dir, ckpt_output_dir = config_log(
        opt, get_output_path(opt), file_logging=_process_topology()[0] == 0
    )

    from ..data import get_label_mean

    mean = get_label_mean(opt.scene, opt.task)
    import jax.numpy as jnp

    s2d_mode = getattr(opt, "stem_s2d", "auto")
    model = common.build_network(
        opt.scene, opt.task, opt.tiny, opt.grayscale, opt.uncertainty, opt.fullsize,
        mean, num_mlr=num_mlr,
        num_unfrozen_encoder=1 if opt.unfreeze_coord_encoder else 0,
        dtype=jnp.bfloat16 if getattr(opt, "bf16", False) else None,
        stem_s2d=s2d_mode == "on" or (
            s2d_mode == "auto" and jax.default_backend() == "tpu"),
    )
    logging.info("%d network weights to load, flag_unfreeze_coord_encoder: %s",
                 num_mlr, opt.unfreeze_coord_encoder)

    init_params = None
    if opt.network_in is None:
        import jax.numpy as jnp

        in_ch = 1 if opt.grayscale else 3
        params = model.init(jax.random.PRNGKey(2021), jnp.zeros((1, 64, 64, in_ch)))["params"]
        init_params = common.wire_mlr_weights(params, model, encoder_paths,
                                              opt.reuse_coord_encoder)
        # persist the initialized model like the reference
        # (`utils/learning.py:368-370`); rank 0 only — in a multi-host run
        # every process reaches this line and torch.save is not atomic
        if jax.process_index() == 0:
            model_path = os.path.join(output_dir, "model.net")
            compat.save_net(model_path, init_params, model)
            logging.info("Saving the initialized MLR model weight to {:s}".format(model_path))

    run_training(opt, output_dir, ckpt_output_dir, model=model, init_params=init_params)


if __name__ == "__main__":
    main()
