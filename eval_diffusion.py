#!/usr/bin/env python
"""Stage-2 eval CLI: unconditional generation FID/KID.

TPU-native counterpart of the reference eval_diffusion.py (same flags):
generate num_samples point clouds, render each from the fixed test poses,
compute FID + KID against precomputed Inception statistics.
"""
import argparse
import os
import os.path as osp
import sys


def eval(args):
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from npcd_tpu.eval import DiffusionEvaluation
    from npcd_tpu.models.npcd import NPCD
    from npcd_tpu.utils import load_config, logging, print_config, writer
    from npcd_tpu.utils.checkpoint import load_weights_only
    from npcd_tpu.utils.util import set_seed

    set_seed(args.seed)
    out_dir = args.output
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        logging.add_log_file(osp.join(out_dir, "log.txt"))
        with open(osp.join(out_dir, "cmd.txt"), "a") as f:
            f.write(" ".join(sys.argv) + "\n")
        writer.setup_writers(args.log_dir or out_dir, tensorboard=not args.no_tensorboard)

    config = load_config(args.config)
    if args.matmul_precision != "default":
        # reference-exact f32 renders on TPU need 'highest' matmul
        # precision (see eval_pointnerf.py / docs/PARITY.md "renderer
        # precision"); applies to the FID protocol's 251k renders
        rc = dict(config.get("render_config", {}))
        rc.setdefault("matmul_precision", args.matmul_precision)
        config["render_config"] = rc
    print_config(config)

    model = NPCD.from_config(config)
    params = model.init_params(jax.random.PRNGKey(args.seed))
    # weights checkpoint holds {'pointnerf': ..., 'diffusion': DiffusionState}
    params = load_weights_only(
        args.weights, params,
        expected_layout={"qkv_groups": model.diffusion.denoiser.resolved_qkv_groups()},
    )
    logging.info(f"Loaded weights from {args.weights}")

    mesh = None
    if args.mesh:
        from npcd_tpu.parallel import make_mesh

        mesh = make_mesh()
    eval_kw = dict(config["diffusion_evaluation"])
    if getattr(args, "render_dtype", None):  # CLI override (see
        eval_kw["render_dtype"] = (  # DiffusionEvaluation.render_dtype
            None if args.render_dtype == "float32" else args.render_dtype)
    evaluation = DiffusionEvaluation(
        out_dir=out_dir,
        mesh=mesh,
        **eval_kw,
    )
    # precision scope: the RENDER runs exact-f32 via the render_config
    # injection above (the PSNR/FID-relevant surface); the SAMPLER keeps
    # its qualified default-precision attention — the fused QKV kernel
    # pins DEFAULT dot precision by contract (an ambient 'highest' would
    # blow its scoped-VMEM plan, and the sampler chain is contractive:
    # even the full-bf16 sampler is qualified end-to-end, docs/PARITY.md)
    evaluation(
        model,
        params["pointnerf"],
        params["diffusion"],
        rng=jax.random.PRNGKey(args.seed),
        num_qualitatives=args.num_qualitatives,
    )
    if out_dir:
        writer.close_writers()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", help="Path to folder for output data.")
    parser.add_argument("--config", help="Path to config file.", required=True)
    parser.add_argument("--weights", help="Path to weights of the model.", required=True)
    parser.add_argument("--seed", type=int, default=42, help="Random seed. Default: 42.")
    parser.add_argument("--eval_name", type=str, help="Name of the evaluation. Optional.")
    parser.add_argument("--finished_iterations", type=int,
                        help="Training iterations of the model (logging only).")
    parser.add_argument("--num_qualitatives", type=int, default=10,
                        help="Number of qualitative renders to save.")
    parser.add_argument("--log_dir", help="Folder for tensorboard logs. Default: output dir.")
    parser.add_argument("--render_dtype", choices=["float32", "bfloat16"],
                        help="Override the FID render precision (float32 = "
                             "reference-exact; bfloat16 = qualified speed "
                             "option, see configs/npcd_srncars_fast.yaml).")
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--wandb", action="store_true",
                        help="Accepted for reference-CLI compatibility (wandb is not bundled).")
    parser.add_argument("--exp_id", type=str)
    parser.add_argument("--comment", type=str)
    parser.add_argument("--platform", type=str, default=None,
                        help="Force JAX platform (e.g. cpu, tpu).")
    parser.add_argument("--matmul_precision", default="highest",
                        choices=["default", "float32", "highest",
                                 "tensorfloat32"],
                        help="Render matmul precision for the FID "
                             "protocol; 'highest' (default) = reference-"
                             "exact f32 on TPU; 'tensorfloat32' = bf16x3 "
                             "middle setting, 1.6x faster renders at "
                             "~2^-16 operand error (Pallas kernels "
                             "emulate it; see ops/pallas/fused_mlp._kdot).")
    parser.add_argument("--mesh", action="store_true",
                        help="Data-parallel eval over all local devices "
                             "(objects shard in the sampler and renderer).")
    eval(parser.parse_args())
