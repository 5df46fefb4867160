#!/usr/bin/env python
"""Stage-2 CLI: train the diffusion model on stage-1 latents.

TPU-native counterpart of the reference train_diffusion.py (same flags and
config schema). --dtype float16 maps to bfloat16 (the TPU-native low
precision; no GradScaler needed). Stage-1 weights load from an orbax
weights-only checkpoint produced by train_pointnerf.py.
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
    import jax.numpy as jnp

    from npcd_tpu.data import PointNeRFDataset
    from npcd_tpu.parallel import make_mesh
    from npcd_tpu.train import DiffusionTraining
    from npcd_tpu.utils import load_config, logging, print_config, writer
    from npcd_tpu.utils.checkpoint import load_weights_only
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

    dtype = {
        "float32": jnp.float32,
        # bf16 is the TPU-native low precision; fp16 requests map onto it
        "float16": jnp.bfloat16,
        "bfloat16": jnp.bfloat16,
    }[args.dtype]

    from npcd_tpu.utils.builders import build_diffusion_model, build_pointnerf

    pointnerf = build_pointnerf(config)
    pn_params = pointnerf.init_params(jax.random.PRNGKey(args.seed))
    # strict=False in the reference (train_diffusion.py:54): tolerate
    # embedding-table shape mismatches via warn-and-reinit
    pn_params = load_weights_only(args.pointnerf_weights, pn_params, tolerant=True)
    logging.info(f"Loaded pointnerf weights from {args.pointnerf_weights}")

    dataset = PointNeRFDataset(pointnerf=pointnerf, params=pn_params)

    model = build_diffusion_model(config, dtype=dtype, remat=(dtype != jnp.float32))
    mesh = make_mesh() if args.mesh and args.tp <= 1 else None

    training = DiffusionTraining(
        out_dir=args.output,
        model=model,
        dataset=dataset,
        seed=args.seed,
        mesh=mesh,
        tp=args.tp,
        **config["diffusion_training"],
    )
    training()
    writer.close_writers()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", help="Path to folder for output data.", required=True)
    parser.add_argument("--config", help="Path to config file.", required=True)
    parser.add_argument("--pointnerf_weights", required=True,
                        help="Path to stage-1 weights-only checkpoint.")
    parser.add_argument("--dtype", type=str, default="float16",
                        help="float32, float16 (=bf16 on TPU) or bfloat16. Default: float16.")
    parser.add_argument("--seed", type=int, default=42, help="Random seed. Default: 42.")
    parser.add_argument("--num_workers", type=int, default=8,
                        help="Number of workers for data loading. Default: 8.")
    parser.add_argument("--no_tensorboard", action="store_true",
                        help="Do not log to tensorboard. Default: do log.")
    parser.add_argument("--wandb", action="store_true",
                        help="Log to Weights & Biases (requires the wandb package).")
    parser.add_argument("--exp_id", type=str, help="Experiment ID.")
    parser.add_argument("--comment", type=str, help="Comment for the experiment.")
    parser.add_argument("--tp", type=int, default=1,
                        help="Megatron tensor-parallel degree over a (data, model) "
                             "mesh (shard_map step; tp must divide the model's "
                             "qkv_groups and the local device count).")
    parser.add_argument("--mesh", action="store_true",
                        help="Data-parallel training over all local devices.")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force JAX platform (e.g. cpu, tpu).")
    train(parser.parse_args())
