"""Convert stable-baselines3 PPO checkpoints (best_model.zip) to the npz
format consumed by tum_control_tpu.learn.policy.load_sb3_policy.

The reference ships trained WMPC policies as SB3 zips
(Learning_To_Adapt/SafeRL_WMPC/_models/*/best_model/best_model.zip); this
framework runs them as pure-JAX MLPs. Usage:

    python tools/convert_sb3_checkpoint.py <src_models_dir> <dst_dir>

Requires torch (CPU) only — SB3 itself is not needed: the zip's policy.pth
is a plain torch state dict.
"""
import io
import os
import shutil
import sys
import zipfile

import numpy as np
import torch


def convert(zip_path: str, out_dir: str) -> None:
    with zipfile.ZipFile(zip_path) as z:
        with z.open("policy.pth") as fh:
            sd = torch.load(io.BytesIO(fh.read()), map_location="cpu", weights_only=False)
    os.makedirs(out_dir, exist_ok=True)
    arrs = {k.replace(".", "__"): v.numpy() for k, v in sd.items()}
    np.savez(os.path.join(out_dir, "policy_weights.npz"), **arrs)


def main():
    src_root, dst_root = sys.argv[1], sys.argv[2]
    for name in sorted(os.listdir(src_root)):
        zpath = os.path.join(src_root, name, "best_model", "best_model.zip")
        if not os.path.exists(zpath):
            continue
        out = os.path.join(dst_root, name)
        convert(zpath, out)
        cfg = os.path.join(src_root, name, "rl_config.yaml")
        if os.path.exists(cfg):
            shutil.copy(cfg, os.path.join(out, "rl_config.yaml"))
        print(f"converted {name}")


if __name__ == "__main__":
    main()
