#!/usr/bin/env python
"""Push-button PSNR/FID parity harness against the reference's published
numbers (reference README.md:70-93: PSNR 30.2, FID 28.6 on SRN Cars).

Converts the reference PyTorch checkpoint to npcd_tpu pytrees
(utils/convert_reference.py), runs the stage-1 PSNR evaluation and the
stage-2 generate->render->FID evaluation with the exact reference protocol
(2347 train objects x 50 views at 128^2; 1000 generated objects x 251 test
poses, StyleGAN TorchScript Inception), and prints both numbers next to
the targets.

Required assets (none ship with this repo; see ASSETS below):
  --weights        npcd_srncars.pt            (reference release checkpoint)
  --srn-root       SRN cars_train directory   (images/poses/intrinsics/
                                               pointclouds, reference
                                               data/download_*.sh layout)
  --inception      inception-2015-12-05.pt    (StyleGAN TorchScript graph)
  --inception-pkl  cars_test Inception stats  (SSDNeRF pipeline pickle with
                                               {mean, cov, feats_np})

Usage (full parity, both stages):
  python tools/parity_eval.py \
      --weights weights/npcd_srncars.pt --srn-root data/cars_train \
      --inception data/inception-2015-12-05.pt \
      --inception-pkl data/cars_test_inception_stylegan.pkl \
      --out runs/parity

ASSETS — where the reference gets them (zero-egress environments must
stage these by hand):
  * npcd_srncars.pt + SRN data: reference README.md "Downloads" section
    (lmb-freiburg release links; data/download_pointclouds.sh).
  * inception-2015-12-05.pt: the StyleGAN FID network
    (nvlabs TorchScript export; mmgen downloads it on first use).
  * inception pkl: produced by the SSDNeRF eval pipeline over cars_test
    (reference npcd/utils/fidkid.py:47-55 documents the format) — or
    regenerate it locally from the raw cars_test split with
    tools/compute_inception_stats.py (needs only the two assets above).

Smoke-testable offline: every stage takes injectable pieces (dataset,
feature_extractor, pose subset), exercised end-to-end by
tests/test_parity_harness.py on synthetic data with a synthetic
reference-layout torch checkpoint.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

PSNR_TARGET = 30.2  # reference README.md:72 (published weights)
FID_TARGET = 28.6   # reference README.md:93


def convert_weights(weights_path: str, config) -> dict:
    """Reference npcd_srncars.pt -> {'pointnerf': params, 'diffusion':
    DiffusionState} in npcd_tpu layout (grouped qkv columns etc.)."""
    from npcd_tpu.utils.convert_reference import convert_checkpoint

    m = config["model"]
    return convert_checkpoint(
        weights_path,
        n_obj=m["n_obj"],
        num_points=m.get("num_points", 512),
        feat_dim=m.get("feats_dim", 32),
        layers=m.get("layers", 24),
    )


def run_psnr(
    config,
    pointnerf_params,
    out_dir,
    dataset=None,
    samples=None,
    eval_batch_size=1,
    qualitatives=0,
):
    """Stage-1 parity: PSNR of the converted autodecoder on its training
    scenes (reference eval_pointnerf.py protocol)."""
    import jax

    from npcd_tpu.eval import PointNeRFEvaluation
    from npcd_tpu.utils.builders import build_dataset, build_pointnerf

    if dataset is None:
        dataset = build_dataset(config)
    model = build_pointnerf(config)
    init = model.init_params(jax.random.PRNGKey(0))
    # structural check: the converted tree must drop in for the init tree
    # (same treedef AND same leaf shapes)
    if jax.tree_util.tree_structure(init) != jax.tree_util.tree_structure(
        pointnerf_params
    ):
        raise ValueError(
            "converted pointnerf params do not match the model tree "
            "(config/model mismatch?)"
        )
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(init)[0],
        jax.tree_util.tree_leaves(pointnerf_params),
    ):
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"converted param shape mismatch at "
                f"{jax.tree_util.keystr(path)}: model {tuple(a.shape)} vs "
                f"checkpoint {tuple(np.shape(b))}"
            )
    evaluation = PointNeRFEvaluation(
        out_dir=osp.join(out_dir, "pointnerf") if out_dir else None,
        eval_batch_size=eval_batch_size,
    )
    results = evaluation(
        dataset,
        model,
        pointnerf_params,
        samples=samples,
        qualitatives=qualitatives,
        resolution=model.opts.default_resolution,
    )
    return float(results["psnr"].mean())


def run_fid(
    config,
    converted,
    out_dir,
    inception_path=None,
    inception_pkl=None,
    feature_extractor=None,
    num_samples=None,
    max_poses=None,
    generate_batch_size=16,
    rng_seed=42,
):
    """Stage-2 parity: FID/KID of generated objects rendered from the fixed
    test poses (reference eval_diffusion.py protocol)."""
    import jax

    from npcd_tpu.eval import DiffusionEvaluation
    from npcd_tpu.models.npcd import NPCD

    model = NPCD.from_config(config)
    eval_cfg = dict(config.get("diffusion_evaluation", {}))
    if num_samples is not None:
        eval_cfg["num_samples"] = num_samples
    if inception_pkl is not None:
        eval_cfg["inception_pkl_path"] = inception_pkl
    if inception_path is not None:
        eval_cfg["inception_path"] = inception_path
    evaluation = DiffusionEvaluation(
        out_dir=osp.join(out_dir, "diffusion") if out_dir else None,
        feature_extractor=feature_extractor,
        generate_batch_size=generate_batch_size,
        max_poses=max_poses,
        **eval_cfg,
    )
    results = evaluation(
        model,
        converted["pointnerf"],
        converted["diffusion"],
        rng=jax.random.PRNGKey(rng_seed),
        num_qualitatives=0,
    )
    return float(results["fid"]), float(results["kid"])


def check_assets(
    weights=None,
    srn_root=None,
    inception=None,
    inception_pkl=None,
    config=None,
    n_sample_ids=3,
):
    """Validate the ASSETS.md staging manifest without running anything
    expensive: paths, checkpoint keys/shapes, SRN per-object layout,
    TorchScript graph load, Inception-stats pickle schema. Returns a list
    of problem strings (empty = everything needed is in place), so a run
    on a freshly provisioned machine fails in seconds, not hours."""
    problems = []

    def missing(what, path):
        problems.append(f"MISSING {what}: {path}")

    if weights is not None:
        if not osp.isfile(weights):
            missing("reference checkpoint (npcd_srncars.pt)", weights)
        else:
            import torch

            try:
                sd = torch.load(weights, map_location="cpu", weights_only=False)
                if isinstance(sd, dict) and "model" in sd and not any(
                    k.startswith("pointnerf.") for k in sd
                ):
                    sd = sd["model"]
                pn_keys = [k for k in sd if k.startswith("pointnerf.")]
                if not pn_keys:
                    problems.append(
                        f"BAD checkpoint {weights}: no 'pointnerf.*' keys "
                        f"(got {sorted(sd)[:5]}...)"
                    )
                else:
                    # the FlexEmbedding tables ride in extra-state dicts;
                    # locate the feats table and check n_obj consistency
                    n_obj = (config or {}).get("model", {}).get("n_obj")
                    feats_keys = [
                        k for k in pn_keys
                        if "feats" in k and "extra_state" in k.replace("-", "_")
                    ]
                    if n_obj and feats_keys:
                        emb = sd[feats_keys[0]]
                        # FlexEmbedding extra-state nests {'emb': {'weight':
                        # tensor}} (reference flex_embedding.py:9-26)
                        while isinstance(emb, dict):
                            emb = next(iter(emb.values())) if emb else None
                        rows = (
                            np.shape(emb)[0]
                            if emb is not None and np.ndim(emb) else None
                        )
                        if rows is not None and rows != n_obj:
                            problems.append(
                                f"BAD checkpoint {weights}: feats table has "
                                f"{rows} objects, config expects {n_obj}"
                            )
                if not any(k.startswith("diffusion.") for k in sd):
                    problems.append(
                        f"WARN checkpoint {weights}: no 'diffusion.*' keys "
                        f"(stage-2 parity will be impossible)"
                    )
            except Exception as e:
                problems.append(f"BAD checkpoint {weights}: torch.load failed: {e}")

    if srn_root is not None:
        if not osp.isdir(srn_root):
            missing("SRN root dir", srn_root)
        else:
            lists_dir = osp.join(
                osp.dirname(osp.realpath(__file__)), "..", "npcd_tpu", "data",
                "sample_lists",
            )
            try:
                with open(osp.join(lists_dir, "srn_cars_train.list")) as f:
                    ids = [ln.strip() for ln in f if ln.strip()]
            except OSError as e:
                problems.append(f"BAD sample list: {e}")
                ids = []
            found_any = False
            for oid in ids[:n_sample_ids]:
                obj = osp.join(srn_root, oid)
                if not osp.isdir(obj):
                    missing(f"SRN object dir ({oid})", obj)
                    continue
                found_any = True
                for sub in ("rgb/000000.png", "pose/000000.txt",
                            "intrinsics.txt"):
                    if not osp.isfile(osp.join(obj, sub)):
                        missing(f"SRN file ({oid})", osp.join(obj, sub))
                has_pc = any(
                    osp.isfile(osp.join(obj, n))
                    for n in ("pointcloud3_512.npz", "pointcloud3.npz")
                )
                if not has_pc:
                    missing(
                        f"SRN point cloud ({oid}, pointcloud3_512.npz or "
                        f"pointcloud3.npz for FPS fallback)",
                        osp.join(obj, "pointcloud3*.npz"),
                    )
            if ids and not found_any:
                problems.append(
                    f"BAD SRN root {srn_root}: none of the first "
                    f"{n_sample_ids} train-list object dirs exist — wrong "
                    f"root? (expected e.g. {ids[0]}/rgb/...)"
                )

    if inception is not None:
        if not osp.isfile(inception):
            missing("StyleGAN Inception TorchScript graph", inception)
        else:
            import torch

            try:
                torch.jit.load(inception, map_location="cpu")
            except Exception as e:
                problems.append(
                    f"BAD inception graph {inception}: torch.jit.load "
                    f"failed: {e}"
                )

    if inception_pkl is not None:
        if not osp.isfile(inception_pkl):
            missing("Inception statistics pickle", inception_pkl)
        else:
            import pickle

            try:
                with open(inception_pkl, "rb") as f:
                    d = pickle.load(f)
                for key in ("mean", "cov"):
                    if key not in d:
                        problems.append(
                            f"BAD inception pkl {inception_pkl}: missing "
                            f"'{key}' (reference fidkid.py:47-55 schema)"
                        )
                if "mean" in d and np.shape(d["mean"]) != (2048,):
                    problems.append(
                        f"BAD inception pkl {inception_pkl}: mean shape "
                        f"{np.shape(d['mean'])}, expected (2048,)"
                    )
                if "cov" in d and np.shape(d["cov"]) != (2048, 2048):
                    problems.append(
                        f"BAD inception pkl {inception_pkl}: cov shape "
                        f"{np.shape(d['cov'])}, expected (2048, 2048)"
                    )
                if "feats_np" not in d:
                    problems.append(
                        f"WARN inception pkl {inception_pkl}: no 'feats_np' "
                        f"(KID needs per-image features; FID still works)"
                    )
            except Exception as e:
                problems.append(
                    f"BAD inception pkl {inception_pkl}: unpickle failed: {e}"
                )

    return problems


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--weights", required=True, help="reference npcd_srncars.pt")
    p.add_argument("--config", default="configs/npcd_srncars.yaml")
    p.add_argument("--srn-root", default=None,
                   help="SRN cars_train dir; overrides paths.toml [srn] root")
    p.add_argument("--inception", default=None,
                   help="inception-2015-12-05.pt TorchScript graph")
    p.add_argument("--inception-pkl", default=None,
                   help="cars_test Inception statistics pickle")
    p.add_argument("--out", default="runs/parity")
    p.add_argument("--stage", choices=["both", "psnr", "fid"], default="both")
    p.add_argument("--psnr-samples", type=int, default=None,
                   help="evaluate a subset of objects (default: all 2347)")
    p.add_argument("--num-samples", type=int, default=None,
                   help="generated objects for FID (default: config, 1000)")
    p.add_argument("--max-poses", type=int, default=None,
                   help="pose subset for FID smoke runs (default: all 251)")
    p.add_argument("--generate-batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--validity", choices=["knn", "voxel"], default="voxel",
                   help="sample-validity semantic for the renders. "
                        "Default 'voxel' = the CUDA voxel-grid occupancy "
                        "window the PUBLISHED weights were trained and "
                        "evaluated under (reference pointnerf.py:67-75) — "
                        "a model renders poorly under the other semantic "
                        "(docs/experiments/validity_ab.json: 41.7 vs "
                        "23.9 dB), so parity evals of the released "
                        "checkpoint must use voxel. 'knn' = the "
                        "reference's pure-tensor fallback semantic "
                        "(aggregator.py:42-58), npcd_tpu's default for "
                        "self-trained models. See docs/PARITY.md "
                        "'validity'.")
    p.add_argument("--matmul-precision", default="highest",
                   choices=["default", "float32", "highest",
                            "tensorfloat32"],
                   help="render matmul precision; 'highest' (default) = "
                        "reference-exact f32 renders on TPU; "
                        "'tensorfloat32' = bf16x3, 1.6x faster at ~2^-16 "
                        "operand error")
    p.add_argument("--check-assets", action="store_true",
                   help="validate the ASSETS.md manifest (paths, "
                        "checkpoint keys, SRN layout, TS graph, stats "
                        "pkl) and exit — no evaluation is run")
    args = p.parse_args(argv)

    from npcd_tpu.utils import load_config, logging
    from npcd_tpu.utils.util import set_seed

    if args.check_assets:
        config = load_config(args.config)
        problems = check_assets(
            weights=args.weights,
            srn_root=args.srn_root,
            inception=args.inception,
            inception_pkl=args.inception_pkl,
            config=config,
        )
        hard = [q for q in problems if not q.startswith("WARN")]
        for q in problems:
            print(q)
        if hard:
            print(f"ASSET CHECK FAILED: {len(hard)} problem(s)")
            sys.exit(1)
        print("ASSET CHECK OK"
              + (f" ({len(problems)} warning(s))" if problems else ""))
        return

    set_seed(args.seed)
    if args.srn_root:
        # highest-priority override for the dataset root (see data/dataset.py)
        os.environ["NPCD_TPU_SRN_ROOT"] = args.srn_root
    os.makedirs(args.out, exist_ok=True)
    logging.add_log_file(osp.join(args.out, "log.txt"))
    with open(osp.join(args.out, "cmd.txt"), "a") as f:
        f.write(" ".join(sys.argv) + "\n")

    config = load_config(args.config)
    rc = dict(config.get("render_config", {}))
    if args.validity:
        rc["validity"] = args.validity
    if args.matmul_precision != "default":
        # parity-of-record renders are exact-f32 (TPU DEFAULT precision
        # deviates ~2% RMS; docs/experiments/renderer_precision.json)
        rc.setdefault("matmul_precision", args.matmul_precision)
    if rc:
        config["render_config"] = rc
    logging.info(f"Converting reference checkpoint {args.weights} ...")
    converted = convert_weights(args.weights, config)

    summary = {"psnr_target": PSNR_TARGET, "fid_target": FID_TARGET}
    if args.stage in ("both", "psnr"):
        psnr = run_psnr(config, converted["pointnerf"], args.out,
                        samples=args.psnr_samples)
        summary["psnr"] = round(psnr, 3)
        logging.info(
            f"PSNR {psnr:.2f} vs target {PSNR_TARGET} "
            f"({'PASS' if psnr >= PSNR_TARGET else 'below target'})"
        )
    if args.stage in ("both", "fid"):
        if "diffusion" not in converted:
            raise ValueError("checkpoint has no diffusion weights")
        fid, kid = run_fid(
            config, converted, args.out,
            inception_path=args.inception,
            inception_pkl=args.inception_pkl,
            num_samples=args.num_samples,
            max_poses=args.max_poses,
            generate_batch_size=args.generate_batch_size,
            rng_seed=args.seed,
        )
        summary["fid"] = round(fid, 3)
        summary["kid_x1000"] = round(kid, 4)
        logging.info(
            f"FID {fid:.2f} vs target {FID_TARGET} "
            f"({'PASS' if fid <= FID_TARGET else 'above target'})"
        )

    with open(osp.join(args.out, "parity.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
