#!/usr/bin/env python3
"""Real-checkpoint VPR descriptor parity harness.

Takes a reference CosPlace/NetVLAD ``.pth`` (the files
``models/download.sh`` fetches in the reference repo), converts it to the
JAX inference path, and asserts descriptor cosine parity against torch
inference — including the reference's sklearn-PCA + L2-normalize
postprocessing for NetVLAD (``/root/reference/cslam/vpr/netvlad.py:209-237``).

    python tools/vpr_checkpoint_parity.py --technique cosplace \
        --checkpoint /path/to/resnet18_64.pth
    python tools/vpr_checkpoint_parity.py --technique netvlad \
        --checkpoint /path/to/netvlad.pth --pca /path/to/netvlad_pca.pkl

Exit code 0 iff min cosine >= --tolerance (default 0.999).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--technique", choices=["cosplace", "netvlad"],
                    required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--pca", default=None,
                    help="sklearn PCA pickle (netvlad only)")
    ap.add_argument("--dim", type=int, default=64,
                    help="cosplace fc_output_dim")
    ap.add_argument("--tolerance", type=float, default=0.999,
                    help="min acceptable descriptor cosine")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from cslam_tpu.models import torch_ref

    if args.technique == "cosplace":
        result = torch_ref.check_cosplace_parity(args.checkpoint,
                                                 fc_output_dim=args.dim)
    else:
        result = torch_ref.check_netvlad_parity(args.checkpoint,
                                                pca_path=args.pca)
    ok = result["min_cosine"] >= args.tolerance
    print(json.dumps({"technique": args.technique, "ok": ok, **result}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
