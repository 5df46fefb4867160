#!/usr/bin/env python
"""Stage-1 CLI: train the PointNeRF autodecoder.

TPU-native counterpart of the reference train_pointnerf.py (same flags and
config schema). Extra TPU flags: --mesh for data-parallel training over all
local devices, --platform to force a JAX backend.
"""
import argparse
import os
import os.path as osp
import sys


def train(args):
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.parallel import make_mesh
    from npcd_tpu.train import PointNeRFTraining
    from npcd_tpu.utils import load_config, logging, print_config, writer
    from npcd_tpu.utils.util import set_seed

    set_seed(args.seed)
    os.makedirs(args.output, exist_ok=True)
    logging.add_log_file(osp.join(args.output, "log.txt"))
    with open(osp.join(args.output, "cmd.txt"), "a") as f:
        f.write(" ".join(sys.argv) + "\n")
    writer.setup_writers(args.output, tensorboard=not args.no_tensorboard,
                         wandb=args.wandb, exp_id=args.exp_id,
                         comment=args.comment)

    config = load_config(args.config)
    print_config(config)

    from npcd_tpu.utils.builders import build_dataset, build_pointnerf

    dataset = build_dataset(config)
    model = build_pointnerf(config)
    mesh = make_mesh() if args.mesh else None

    training = PointNeRFTraining(
        out_dir=args.output,
        model=model,
        dataset=dataset,
        loss_weights=PointNeRFLossWeights(
            image_reconstruction=1.0,
            neural_point_cloud_kl=1e-7,
            neural_point_cloud_tv=3.5e-7,
        ),
        seed=args.seed,
        mesh=mesh,
        **config["pointnerf_training"],
    )
    training()
    writer.close_writers()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", help="Path to folder for output data.", required=True)
    parser.add_argument("--config", help="Path to config file.", required=True)
    parser.add_argument("--seed", type=int, help="Random seed. Default: 42.", default=42)
    parser.add_argument("--num_workers", type=int, default=8,
                        help="Number of workers for data loading. Default: 8.")
    parser.add_argument("--no_tensorboard", action="store_true",
                        help="Do not log to tensorboard. Default: do log.")
    parser.add_argument("--wandb", action="store_true",
                        help="Log to Weights & Biases (requires the wandb package).")
    parser.add_argument("--exp_id", type=str, help="Experiment ID.")
    parser.add_argument("--comment", type=str, help="Comment for the experiment.")
    parser.add_argument("--mesh", action="store_true",
                        help="Data-parallel training over all local devices.")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force JAX platform (e.g. cpu, tpu).")
    train(parser.parse_args())
