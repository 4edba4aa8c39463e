"""One-time converter: reference torch checkpoints -> framework .npz.

The reference ships whole-module torch pickles with keys 'model_acgt' /
'model_nacgt' (clairs/predict.py:512-568).  This tool loads them (torch
required only here, never at calling time), extracts the state_dict, and
writes .npz checkpoints consumable by clairs_to_tpu (models/convert.py maps
the names onto the JAX pytrees; verified numerically in
tests/test_model_parity.py).

Usage:
  python tools/convert_checkpoint.py --torch_pkl pileup_affirmative.pkl \
      --kind aff --mode snv --output aff.npz
"""

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_pkl", required=True, help="reference .pkl checkpoint")
    p.add_argument("--kind", required=True, choices=["aff", "neg"])
    p.add_argument("--mode", default="snv", choices=["snv", "indel"])
    p.add_argument("--output", required=True, help=".npz output path")
    args = p.parse_args(argv)

    import torch

    sys.path.insert(0, "/root/repo")
    from dataclasses import asdict

    from clairs_to_tpu.models import bigru, convert, cvt

    saved = torch.load(args.torch_pkl, map_location="cpu", weights_only=False)
    key = "model_acgt" if args.kind == "aff" else "model_nacgt"
    module = saved[key] if isinstance(saved, dict) and key in saved else saved
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}

    if args.kind == "aff":
        config = cvt.SNV_CVT_CONFIG if args.mode == "snv" else cvt.INDEL_CVT_CONFIG
        params = convert.cvt_params_from_state_dict(sd, config)
    else:
        config = (
            bigru.SNV_BIGRU_CONFIG if args.mode == "snv" else bigru.INDEL_BIGRU_CONFIG
        )
        params = convert.bigru_params_from_state_dict(sd, config)

    from clairs_to_tpu.train import save_checkpoint

    save_checkpoint(args.output, params, arch=asdict(config))
    print(f"[INFO] wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
