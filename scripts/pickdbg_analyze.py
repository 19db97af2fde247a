"""Post-mortem of CATGRASP_PICK_DEBUG dumps (oracle-nut pick regression).

For every per-attempt dump, separates the two candidate explanations of a
width-0 "closed on air" failure:
  * selection bug — the chosen grasp never straddled the target's observed
    points (channel count ~0 at the commanded pose), or
  * displacement — the grasp DID straddle the object (channel well
    populated) and the approach/close shoved it away before the fingers met
    it (ends 30-80 mm off axis with width 0).

    python scripts/pickdbg_analyze.py [logs/pickdbg_r4]
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from catgrasp_tpu.sim.env_grasp import GripperSpec, closing_channel_mask  # noqa: E402


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "logs/pickdbg_r4"
    spec = GripperSpec()
    rows = []
    for f in sorted(glob.glob(os.path.join(d, "pickdbg_*.npz"))):
        z = np.load(f, allow_pickle=True)
        pick = int(z["pick"])
        g = np.asarray(z["grasps_cam"][pick], np.float32)
        pts = np.asarray(z["pts"], np.float32)
        pg = (pts - g[:3, 3]) @ g[:3, :3]
        in_chan = np.asarray(closing_channel_mask(pg, spec))
        t = np.asarray(z["ob_in_grasp"])[:3, 3] * 1e3
        row = {
            "dump": os.path.basename(f),
            "picked": bool(z["picked"]),
            "target": int(z["target"]),
            "prov": int(z["prov"][pick]) if len(np.atleast_1d(z["prov"])) else -1,
            "eng": round(float(z["eng"][pick]), 3),
            "n_chan_pts": int(in_chan.sum()),
            "chan_depth_mm": round(float(
                (spec.finger_len - np.sort(np.where(in_chan, pg[:, 0],
                                                    spec.finger_len))[
                    min(2, len(pg) - 1)]) * 1e3), 1) if len(pg) else 0.0,
            "p_G": round(float(z["p_G"][pick]), 3),
            "p_TgG": round(float(z["p_T_given_G"][pick]), 3),
            "w_f_mm": round(float(z["w_f"]) * 1e3, 1),
            "ob_end_mm": [round(float(x), 1) for x in t],
            "fk_err_mm": round(float(z["fk_err"]) * 1e3, 2) if "fk_err" in z else None,
        }
        rows.append(row)
        print(json.dumps(row))

    fails = [r for r in rows if not r["picked"]]
    print(f"\n{len(rows)} attempts, {len(fails)} failed")
    if fails:
        sel = [r for r in fails if r["n_chan_pts"] < 5]
        print(f"  selection-bug shaped (chan pts < 5): {len(sel)}")
        print(f"  displacement shaped (chan pts >= 5): {len(fails) - len(sel)}")
        print(f"  median chan pts over failures: "
              f"{int(np.median([r['n_chan_pts'] for r in fails]))}")
        print(f"  median engagement over failures: "
              f"{np.median([r['eng'] for r in fails]):.3f}")


if __name__ == "__main__":
    main()
