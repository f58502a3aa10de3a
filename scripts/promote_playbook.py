#!/usr/bin/env python
"""Turn a chip_playbook.py result file into a promotion plan.

The recovery watcher runs scripts/chip_playbook.py unattended and leaves
/tmp/chip_playbook.json; promotion into EncoderSettings DEFAULTS needs a
human (or the next session) to read the numbers. This script applies the
playbook's own gates (fps >= +2%, psnr >= -0.15 dB, bytes <= +2% vs the
same-run baseline) and prints, per passing candidate and for the combo:

  - the EncoderSettings field assignments to make default
    (config.py + the [TPU] INI keys round-trip them automatically)
  - the PERF.md table row (fps / psnr / bytes deltas)
  - losers to DELETE per VERDICT r03 #2 ("promote winners ... delete
    losers"), i.e. flag plumbing whose candidate measured at or below
    baseline

Read-only: prints the plan, changes nothing.

Usage: python scripts/promote_playbook.py [/tmp/chip_playbook.json]
"""
import json
import sys

GATE_FPS = 1.02
GATE_PSNR = 0.15
GATE_BYTES = 1.02

# candidate key -> the default it would change (None = env-only knob,
# promoted by changing the module default instead of a settings field)
SETTINGS_OF = {
    # --- round-5 candidates ---
    "knn_v1": "kernels/knn_topk.py: revert to the v1 kernel (knn_backend='pallas_v1')",
    "epu_compact": "(flag DELETED r5: slower AND -0.26 dB)",
    "epu_fused": "(flag DELETED r5: dominated by epu_fused_fp)",
    "epu_fused_fp": "epu_fused_fp=True",
    "field_im2row": "motion_field='im2row'",
    # --- round-4 candidates (closed; verdicts in docs/PERF.md) ---
    "ivf": "knn_backend='ivf'",
    "ivf_p16": "knn_backend='ivf', ivf_probes=16",
    "motion_d48": "motion_rank_dims=48",
    "motion_d108": "motion_rank_dims=108",
    "epu_k32": "epu_knn_k=32",
    "kmeans_i12": "kmeans_iters=12",
    "epu_2s": "epu_two_stage=True",
    "epu_2s_k32": "epu_two_stage=True, epu_knn_k=32",
    "epu_2s_m32": "epu_two_stage=True, epu_stage1_m=32",
    "motion_halo_off": "kernels default: revert halo blocking (MOTION_BM=0)",
    "motion_bm16": "pipeline/motion.py BM default 8 -> 16",
    "tk_blk_2048": "kernels/tk_dither.py BLK default 1024 -> 2048",
    "tk_blk_4096": "kernels/tk_dither.py BLK default 1024 -> 4096",
}


def main(path="/tmp/chip_playbook.json"):
    with open(path) as f:
        r = json.load(f)
    base = dict(r.get("baseline") or {})
    if not base.get("fps"):
        print("no usable baseline in", path)
        return 1
    # window fairness: tunnel flaps mean each child can land in a
    # different-speed window; gate fps against the FASTER of the two
    # baseline measurements so a degraded-window baseline can't
    # false-promote every candidate (psnr/bytes are deterministic).
    post = r.get("baseline_post")
    if isinstance(post, dict) and post.get("fps", 0) > base["fps"]:
        base["fps"] = post["fps"]
        print(f"(fps gate uses baseline_post={post['fps']} — the faster "
              f"of the two baseline windows)")
    print(f"baseline: fps={base['fps']} psnr={base.get('psnr')} "
          f"bytes={base.get('bytes')}  (frames={r.get('frames')}, "
          f"run {r.get('ts')})")
    promote, delete = [], []
    for k, label in SETTINGS_OF.items():
        v = r.get(k)
        if not isinstance(v, dict) or "fps" not in v:
            continue
        dfps = v["fps"] / base["fps"]
        dpsnr = v.get("psnr", 0) - base.get("psnr", 0)
        dbytes = v.get("bytes", 0) / max(base.get("bytes", 1), 1)
        row = (f"{k:16s} fps x{dfps:.3f}  psnr {dpsnr:+.3f} dB  "
               f"bytes x{dbytes:.3f}")
        ok = (dfps >= GATE_FPS and dpsnr >= -GATE_PSNR
              and dbytes <= GATE_BYTES)
        (promote if ok else delete).append((row, k, label))
    print("\nPROMOTE (gates: fps>=+2%, psnr>=-0.15dB, bytes<=+2%):")
    for row, k, label in promote or [("  (none)", "", "")]:
        print(f"  {row}\n      -> default: {label}" if k else row)
    print("\nAT/BELOW baseline (candidates to delete or leave non-default):")
    for row, k, label in delete or [("  (none)", "", "")]:
        print(f"  {row}" if k else row)
    combo = r.get("combo")
    if isinstance(combo, dict) and "fps" in combo:
        print(f"\ncombo [{'+'.join(r.get('combo_flags', []))}]: "
              f"fps={combo['fps']} (x{combo['fps']/base['fps']:.3f}) "
              f"psnr={combo.get('psnr')} bytes={combo.get('bytes')}")
        print("  -> if gates hold, promote the combo's union and record "
              "the per-flag and combo rows in docs/PERF.md")
    city = r.get("city")
    if isinstance(city, dict) and "fps" in city:
        print(f"\nrealistic (city): fps={city['fps']} "
              f"psnr={city.get('psnr')} bytes={city.get('bytes')}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
