"""Export params-only eval checkpoints into the tracked ``artifacts_tracked/``.

The build VM is wiped between sessions (only git survives), so the trained
weights must live in git.  Training blobs carry Adam state (3x params); this
strips to params + metadata so the repo carries ~1/3 the bytes.  The layout
matches ``predict.artifacts.load_predicters`` so eval runs directly with
``--artifacts artifacts_tracked``.  Exported blobs are eval-only (no
``opt_state``): resume training from ``artifacts/`` blobs instead.

    python scripts/export_ckpts.py [--src artifacts] [--dst artifacts_tracked]
"""
import argparse
import os
import sys

from flax import serialization

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from catgrasp_tpu.train.trainer import read_checkpoint_blob  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="artifacts")
    ap.add_argument("--dst", default="artifacts_tracked")
    args = ap.parse_args()
    for net in ("seg", "nunocs", "grasp"):
        src_dir = os.path.join(args.src, net)
        if not os.path.isdir(src_dir):
            print(f"skip {net}: no {src_dir}")
            continue
        src = None
        for name in ("best_val.ckpt", "best_train.ckpt", "last.ckpt"):
            p = os.path.join(src_dir, name)
            if os.path.exists(p):
                src = p
                break
        if src is None:
            print(f"skip {net}: no checkpoint in {src_dir}")
            continue
        blob = read_checkpoint_blob(src)
        slim = {"params": blob["params"], "step": blob["step"],
                "epoch": blob["epoch"]}
        os.makedirs(os.path.join(args.dst, net), exist_ok=True)
        out = os.path.join(args.dst, net, "best_val.ckpt")
        with open(out, "wb") as f:
            f.write(serialization.msgpack_serialize(slim))
        print(f"{net}: {src} -> {out} ({os.path.getsize(out)/1e6:.1f} MB)")
        for extra in ("calib.json", "prior.json"):
            p = os.path.join(src_dir, extra)
            if os.path.exists(p):
                import shutil
                shutil.copy(p, os.path.join(args.dst, net, extra))
                print(f"{net}: copied {extra}")


if __name__ == "__main__":
    main()
