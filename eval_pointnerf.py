#!/usr/bin/env python
"""Stage-1 eval CLI: PSNR of the autodecoder on its training scenes.

TPU-native counterpart of the reference eval_pointnerf.py (same flags).
Runtime measurement is only valid with --eval_batch_size 1 after 3 burn-in
samples (block_until_ready bracketing replaces cuda.synchronize).
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

    from npcd_tpu.eval import PointNeRFEvaluation
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
        # Parity-of-record renders need exact f32 matmuls: on TPU the
        # DEFAULT f32 precision feeds the MXU bf16 operands (~2% RMS
        # render deviation vs the reference's CUDA f32 — measured in
        # docs/experiments/renderer_precision.json), so the PSNR protocol
        # runs at 'highest' unless explicitly lowered.
        rc = dict(config.get("render_config", {}))
        rc.setdefault("matmul_precision", args.matmul_precision)
        config["render_config"] = rc
    print_config(config)

    from npcd_tpu.utils.builders import build_dataset, build_pointnerf

    dataset = build_dataset(config)
    model = build_pointnerf(config)
    params = model.init_params(jax.random.PRNGKey(args.seed))
    params = load_weights_only(args.weights, params, tolerant=True)  # strict=False in the reference
    logging.info(f"Loaded weights from {args.weights}")

    mesh = None
    if args.mesh:
        from npcd_tpu.parallel import make_mesh

        mesh = make_mesh()
    import contextlib

    prec_ctx = (
        jax.default_matmul_precision(args.matmul_precision)
        if args.matmul_precision != "default" else contextlib.nullcontext()
    )
    evaluation = PointNeRFEvaluation(out_dir=out_dir,
                                     eval_batch_size=args.eval_batch_size,
                                     mesh=mesh)
    with prec_ctx:
        evaluation(
            dataset,
            model,
            params,
            samples=args.num_samples,
            sample_indices=args.samples,
            qualitatives=args.num_qualitatives,
            resolution=model.opts.default_resolution,
        )
    if out_dir:
        writer.close_writers()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", help="Path to folder for output data.")
    parser.add_argument("--config", help="Path to config file.", required=True)
    parser.add_argument("--weights", help="Path to weights of the model.", required=True)
    parser.add_argument("--seed", type=int, default=42, help="Random seed. Default: 42.")
    parser.add_argument("--eval_batch_size", type=int, default=1,
                        help="Views per render batch; runtime measurement requires 1.")
    parser.add_argument("--eval_name", type=str, help="Name of the evaluation. Optional.")
    parser.add_argument("--finished_iterations", type=int,
                        help="Training iterations of the model (logging only).")
    parser.add_argument("--num_samples", type=int,
                        help="Number of objects to evaluate. Default: all.")
    parser.add_argument("--samples", type=int, nargs="*",
                        help="Specific sample indices to evaluate.")
    parser.add_argument("--num_qualitatives", type=int, default=10,
                        help="Number of qualitative renders to save.")
    parser.add_argument("--qualitatives", type=int, nargs="*",
                        help="Specific qualitative indices.")
    parser.add_argument("--log_dir", help="Folder for tensorboard logs. Default: output dir.")
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--wandb", action="store_true",
                        help="Accepted for reference-CLI compatibility (wandb is not bundled).")
    parser.add_argument("--exp_id", type=str)
    parser.add_argument("--comment", type=str)
    parser.add_argument("--matmul_precision", default="highest",
                        choices=["default", "float32", "highest",
                                 "tensorfloat32"],
                        help="Render matmul precision. 'highest' (default) "
                             "= reference-exact f32 renders on TPU; "
                             "'tensorfloat32' = bf16x3 middle setting, "
                             "1.6x faster at ~2^-16 operand error (Pallas "
                             "kernels emulate it in-kernel); "
                             "'default' = the ambient JAX precision (MXU "
                             "bf16 operands on TPU, fastest, ~2%% RMS "
                             "render deviation).")
    parser.add_argument("--mesh", action="store_true",
                        help="Data-parallel eval over all local devices "
                             "(view batches shard across the mesh; use with "
                             "--eval_batch_size >= device count).")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force JAX platform (e.g. cpu, tpu).")
    eval(parser.parse_args())
