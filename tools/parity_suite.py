"""Full parity matrix -> one machine-readable artifact (VERDICT r3 task 3).

Runs tools/parity_check.run_parity over the precision x density matrix the
README quotes — bf16 and mixed, nuScenes and Waymo-density, plus the sharp
exact-top-k gate — and writes PARITY_r{N}.json so every parity claim is a
committed artifact instead of README prose.  The reference's only quality
evidence is an eyeballed PNG (README.md:49-72).

    PYTHONPATH=. python tools/parity_suite.py [--out PARITY_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_check import run_parity  # noqa: E402


MATRIX = [
    # (tag, fast precision, density, approx_topk)
    ("bf16_nuscenes_approx", "bf16", None, True),
    ("bf16_nuscenes_exact", "bf16", None, False),
    ("mixed_nuscenes_approx", "mixed", None, True),
    ("bf16_waymo_approx", "bf16", "waymo", True),
    ("bf16_waymo_exact", "bf16", "waymo", False),
    ("mixed_waymo_approx", "mixed", "waymo", True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r04.json")
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    from dsvt_ai_trt_tpu.runtime.compile import enable_persistent_cache
    enable_persistent_cache()

    import jax
    results, all_ok = {}, True
    for tag, fast, density, approx in MATRIX:
        t0 = time.time()
        r = run_parity(fast=fast, density=density, approx=approx,
                       n_frames=args.frames)
        r["seconds"] = round(time.time() - t0, 1)
        del r["frames"]  # worst{} is the gate; per-frame rows stay in logs
        results[tag] = r
        all_ok &= r["parity_ok"]
        print(f"{tag}: ok={r['parity_ok']} worst={r['worst']}", flush=True)

    out = {"device": jax.devices()[0].device_kind,
           "gates": results, "all_ok": all_ok}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}  all_ok={all_ok}")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
