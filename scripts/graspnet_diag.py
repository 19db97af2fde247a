"""Grasp-quality net diagnostic: does p_G rank like the physics scores?

VERDICT r2 done-criterion for the quality net: expected quality (p_G)
rank-correlated with perturbation scores on held-out grasps.  Evaluates the
trained net on val-split packed grasp rows and reports Spearman rho +
per-bin accuracy + CE against the (unbalanced) val marginal.

    python scripts/graspnet_diag.py --class_name nut
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean(); rb -= rb.mean()
    d = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / d) if d > 0 else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--artifacts", default=None)
    ap.add_argument("--val_root", default=None)
    ap.add_argument("--n", type=int, default=4096, help="held-out grasps to score")
    ap.add_argument("--out", default="logs/graspnet_diag.jsonl",
                    help="append the metrics as one JSON line (tracked "
                         "evidence; VERDICT r3: quality claims must be "
                         "reproducible from committed artifacts)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # keep the TPU free; tiny job
    from catgrasp_tpu.config.loader import load_config
    from catgrasp_tpu.data import packed
    from catgrasp_tpu.predict.artifacts import load_predicters

    art = args.artifacts or f"artifacts/{args.class_name}"
    pred = load_predicters(art, args.class_name, roles=("grasp",)).get("grasp")
    if pred is None:
        print(f"no grasp checkpoint under {art}")
        return
    cfg = load_config("config_grasp.yml")
    root = args.val_root or f"dataset/{args.class_name}/packed_val"
    ds = packed.PackedGrasp(root, cfg, phase="val")
    rng = np.random.default_rng(0)
    ks = rng.choice(len(ds), min(args.n, len(ds)), replace=False)

    # score through the SAME transform the dataset applies (cam->grasp frame)
    import jax.numpy as jnp
    n_pts = cfg.get("n_pts", 2048)
    probs, labels, scores = [], [], []
    B = 256
    run = jax.jit(lambda x: jax.nn.softmax(
        pred.model.apply({"params": pred.params}, x)[0], axis=-1))
    for i in range(0, len(ks), B):
        kk = ks[i:i + B]
        raw = ds.clouds[ds.cloud_row[kk]]
        idx = rng.integers(0, ds.P, (len(kk), n_pts))
        raw = np.take_along_axis(raw, idx[..., None], axis=1).astype(np.float32)
        T = np.linalg.inv(ds.pose[kk])
        xyz = np.einsum("bij,bpj->bpi", T[:, :3, :3], raw[..., :3]) + T[:, None, :3, 3]
        nrm = np.einsum("bij,bpj->bpi", T[:, :3, :3], raw[..., 3:6])
        x = np.concatenate([xyz, nrm], -1)
        p = np.asarray(run(jnp.asarray(x)))
        probs.append(p)
        labels.append(np.digitize(ds.score[kk], ds.classes) - 1)
        scores.append(ds.score[kk])
    probs = np.concatenate(probs)
    labels = np.concatenate(labels)
    scores = np.concatenate(scores)

    nb = probs.shape[1]
    ce_raw = float(-np.log(np.maximum(probs[np.arange(len(labels)), labels], 1e-9)).mean())
    # Bayes prior correction: the net trains on bin-BALANCED draws
    # (config_grasp balance_bins), so its softmax estimates p(bin|x) under a
    # uniform prior.  Posterior for the natural distribution is
    # p(bin|x) ∝ p_bal(bin|x)·π(bin) with π the train-set marginal
    # (prior.json written by train_grasp).  Without this, val CE reads above
    # the marginal entropy by up to KL(π‖uniform) even when the net ranks
    # well — the round-3 "worse than the histogram" artifact.
    prior_path = os.path.join(art, "grasp", "prior.json")
    corrected = os.path.exists(prior_path)
    if corrected:
        import json as _json
        with open(prior_path) as f:
            pri = np.asarray(_json.load(f)["bin_prior"], np.float64)
        probs = probs * pri[None, :]
        probs = probs / probs.sum(-1, keepdims=True)
    expq = (probs * (np.arange(nb) + 0.5) / nb).sum(-1)
    ce = float(-np.log(np.maximum(probs[np.arange(len(labels)), labels], 1e-9)).mean())
    acc = float((probs.argmax(-1) == labels).mean())
    top3 = float((np.abs(probs.argmax(-1) - labels) <= 1).mean())
    rho = spearman(expq, scores)
    p_marg = np.bincount(labels, minlength=nb) / len(labels)
    ent = float(-(p_marg[p_marg > 0] * np.log(p_marg[p_marg > 0])).sum())
    print(f"{args.class_name}: n={len(labels)} | spearman(expq, score) = {rho:.3f} | "
          f"val CE {ce:.3f} raw {ce_raw:.3f} prior_corrected={corrected} "
          f"(marginal entropy {ent:.3f}) | exact-bin acc {acc:.3f} "
          f"| within-1-bin {top3:.3f}")
    if args.out:
        import datetime
        import json
        row = {"class": args.class_name, "artifacts": art, "n": int(len(labels)),
               "spearman": round(rho, 4), "val_ce": round(ce, 4),
               "val_ce_raw": round(ce_raw, 4), "prior_corrected": corrected,
               "marginal_entropy": round(ent, 4), "acc": round(acc, 4),
               "within1": round(top3, 4),
               "utc": datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%M:%SZ")}
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
