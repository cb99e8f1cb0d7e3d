#!/usr/bin/env python
"""Convert a reference (torch) trained model checkpoint into this
framework's msgpack format.

The reference saves ``model.state_dict()`` at ``<logdir>/models/*.pth``
(reference trainers/base.py:190-193). This tool maps those weights onto the
rebuild's flax model for the SAME method/config (backbone geometry, nbit,
nclass, adapter dims must match the run that produced the checkpoint) and
writes a ``{params, batch_stats, constants, epoch}`` msgpack blob that the
experiment loads via resume or ``finetune_path`` — so reference users bring
their trained models along instead of retraining.

The output is a complete framework run dir (``config.yaml`` +
``models/best.msgpack``), so the normal eval/finetune flows consume it
directly. Usage (config overrides use the same syntax as main.py):

  python scripts/import_reference_checkpoint.py \
      --pth /path/to/ref_run/models/best.pth \
      --outdir runs/imported \
      model=concepthash backbone=clip_b32 model.nbit=64 dataset=cub200 ...

Then evaluate or finetune:
  python main.py exp=validation logdir=runs/imported
  python main.py ... finetune_path=runs/imported

Forward equivalence of the mapping is tested in
tests/test_import_reference.py (max |Δcodes| ~1e-6 on CLIP towers with
adapters for dpsh / orthohash / concepthash).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="reference models/*.pth")
    ap.add_argument("--outdir", required=True,
                    help="output run dir (gets config.yaml + models/best.msgpack)")
    ap.add_argument("--unsafe", action="store_true",
                    help="allow full-unpickler torch.load for legacy blobs "
                         "that fail weights_only=True (arbitrary code "
                         "execution risk — trusted checkpoints only)")
    ap.add_argument("overrides", nargs="*",
                    help="config overrides (main.py syntax)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # the container's sitecustomize imports jax at interpreter start, so the
    # env var alone is ignored — force the backend explicitly or the template
    # init runs on the TPU relay (2-5 min remote compile, collides with any
    # concurrent TPU process). Same pattern as parity/run_rebuild.py:41-44.
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from concepthash_tpu.config import load_config
    from concepthash_tpu.config.loader import save_config
    from concepthash_tpu.methods import get_method, prepare_codebook
    from concepthash_tpu.utils import io
    from concepthash_tpu.utils.torch_import import (
        import_reference_state_dict, load_state_dict)

    config_dir = os.environ.get("CONCEPTHASH_CONFIG_DIR",
                                os.path.join(REPO, "configs"))
    workdir = os.path.abspath(args.outdir)
    cfg = load_config(config_dir, "train",
                      list(args.overrides) + [f"logdir={workdir}"])
    method = get_method(cfg["model"]["name"])
    os.makedirs(os.path.join(workdir, "models"), exist_ok=True)
    codebook = None
    if method.codebook:
        try:
            codebook = prepare_codebook(method, cfg, workdir)
        except Exception as e:
            # mirror RetrievalExperiment._build_method: offline environments
            # (no network/HF cache, or no local dataset manifest) get the
            # deterministic fallback — harmless here since the checkpoint's
            # trained center overwrites the codebook-derived constant anyway.
            logging.warning("codebook stage failed (%s); offline fallback", e)
            from concepthash_tpu.experiments.hashing import (
                offline_text_embedder,
            )
            from concepthash_tpu.models.backbone_factory import (
                vision_config_from_backbone_cfg,
            )

            dim = int(cfg["model"].get("center_dim", 0) or
                      vision_config_from_backbone_cfg(
                          cfg.get("backbone", {}) or {}).projection_dim)
            codebook = prepare_codebook(
                method, cfg, workdir,
                text_embedder=lambda n: offline_text_embedder(n, dim=dim))
    model = method.build_model(cfg, codebook)

    crop = int((cfg.get("dataset") or {}).get("crop", 224))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    dummy = np.zeros((2, crop, crop, 3), np.float32)
    logging.info("building template (model.init at %dx%d, may take minutes "
                 "on CPU for ViT-B towers)...", crop, crop)
    variables = model.init({"params": rng, "dropout": rng}, dummy,
                           train=False)
    template = {k: variables[k] for k in variables}

    sd = load_state_dict(args.pth, unsafe=args.unsafe)
    newvars, report = import_reference_state_dict(
        sd, cfg["model"]["name"], cfg, template)
    logging.info("mapped %d leaves; %d unused checkpoint keys",
                 len(report.written), len(report.unused))
    if report.missing:
        print("EXPECTED leaves the checkpoint had no value for (these stay "
              "at random init — the imported model is likely WRONG):")
        for k in report.missing:
            print(" ", k)

    blob = {"params": newvars.get("params", {}),
            "batch_stats": newvars.get("batch_stats", {}),
            "constants": newvars.get("constants", {}),
            "epoch": 0}
    out_ckpt = os.path.join(workdir, "models", "best.msgpack")
    io.fast_save(blob, out_ckpt)
    # fast_save is async whenever a prior in-process experiment initialized
    # the save queue — fence so the file exists when we return
    io.join_save_queue()
    save_config(cfg, os.path.join(workdir, "config.yaml"))
    print(f"wrote {out_ckpt} ({len(report.written)} leaves imported, "
          f"{len(report.unused)} reference keys unmapped); evaluate with: "
          f"python main.py exp=validation logdir={workdir}")
    if report.unused:
        print("unmapped keys (variant knobs this importer doesn't cover):")
        for k in report.unused[:20]:
            print(" ", k)


if __name__ == "__main__":
    main()
