"""Seed-variance estimate for the hard-benchmark GSS-vs-opacity margins.

VERDICT r3 item 8: the +0.38 dB post-short-finetune GSS margin ([2s] vs [2t])
and the "[2] vs [2b] is re-convergence noise" claim were point estimates with
no error bars. This script re-runs the short-finetune pair (and the [1b]
no-prune control) at extra seeds on the 512^2 hard preset, REUSING the
existing trained checkpoint (`/tmp/e2e_hard_model_hard/chkpnt15000.npz` — the
seed only affects the finetune's camera shuffle / prune RNG, matching how one
would re-seed the reference's `prune_finetune.py`), evaluates each on the
fixed test set, and appends a variance footnote to E2E_TPU_hard.md.

Usage: python scripts/e2e_seed_variance.py [--seeds 1 2]
"""
import argparse
import importlib.util
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ap = argparse.ArgumentParser()
ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2])
ap.add_argument("--preset", choices=["hard", "hard1080"], default="hard")
ap.add_argument("--skip-control", action="store_true",
                help="skip the [1b] full-budget no-prune control (the "
                "expensive row; VERDICT r4 item 7 asks only [2s]/[2t] at "
                "hard1080)")
args = ap.parse_args()

# e2e_hard.py parses its own CLI at import; give it the chosen preset.
sys.argv = ["e2e_hard.py", "--preset", args.preset]
spec = importlib.util.spec_from_file_location("e2e_hard", REPO / "scripts/e2e_hard.py")
eh = importlib.util.module_from_spec(spec)
spec.loader.exec_module(eh)

from lightgaussian_tpu.cli import prune_finetune
from lightgaussian_tpu.data import ply as ply_mod

MODEL = eh.MODEL
TRAIN_ITERS = eh.TRAIN_ITERS
FTS_END = TRAIN_ITERS + eh.FT_SHORT
FT_END = TRAIN_ITERS + eh.FT_ITERS
CKPT = MODEL / f"chkpnt{TRAIN_ITERS}.npz"
assert CKPT.exists(), (
    f"{CKPT} missing — run `python scripts/e2e_hard.py --preset hard` first")

test_cams, gts = eh.load_test_gt()


def run_ft(model_dir: Path, ptype: str | None, end: int, seed: int):
    """prune_finetune from the shared checkpoint; ptype None = never prune."""
    ply = model_dir / f"point_cloud/iteration_{end}/point_cloud.ply"
    if not ply.exists():
        argv = [
            "-s", str(eh.OUT), "-m", str(model_dir),
            "--start_checkpoint", str(CKPT),
            "--iterations", str(end),
            "--eval", "--test_iterations", str(end),
            "--save_iterations", str(end),
            "--position_lr_max_steps", str(end),
            "--seed", str(seed),
        ]
        if ptype is None:
            argv += ["--prune_iterations", str(10 * end)]
        else:
            argv += ["--prune_iterations", str(TRAIN_ITERS + 5),
                     "--prune_percent", str(eh.PRUNE_RATIO),
                     "--prune_type", ptype]
        prune_finetune.main(argv)
    s = ply_mod.load_gaussian_ply(ply)
    return eh.eval_scene(s, test_cams, gts, model_dir.name)["PSNR"]


rows = []  # (seed, psnr_2s, psnr_2t, psnr_1b)
# seed 0 = the round-3 artifacts (reused if still on disk, re-run otherwise)
seed_dirs = {0: ("_pf_s", "_pf_op_s", "_ctrl")}
for s in args.seeds:
    seed_dirs[s] = (f"_pf_s_seed{s}", f"_pf_op_s_seed{s}", f"_ctrl_seed{s}")

t0 = time.time()
for seed, (d2s, d2t, d1b) in sorted(seed_dirs.items()):
    p2s = run_ft(Path(str(MODEL) + d2s), "v_important_score", FTS_END, seed)
    p2t = run_ft(Path(str(MODEL) + d2t), "opacity", FTS_END, seed)
    p1b = (float("nan") if args.skip_control
           else run_ft(Path(str(MODEL) + d1b), None, FT_END, seed))
    rows.append((seed, p2s, p2t, p1b))
    print(f"seed {seed}: [2s] GSS+shortFT {p2s:.2f}  [2t] opacity+shortFT "
          f"{p2t:.2f}  (margin {p2s-p2t:+.2f} dB)  [1b] no-prune ctrl {p1b:.2f}",
          flush=True)

import numpy as np

margins = [r[1] - r[2] for r in rows]
p2s_all = [r[1] for r in rows]
p2t_all = [r[2] for r in rows]
p1b_all = [r[3] for r in rows]


def stat(xs):
    return f"{np.mean(xs):.2f} (range {min(xs):.2f}..{max(xs):.2f})"


what = ("The [2s]/[2t] short-finetune pair re-run" if args.skip_control else
        "The [2s]/[2t] short-finetune pair and the [1b] control re-run")
lines = [
    "",
    f"## Seed-variance footnote ({'round 5, hard1080' if args.preset == 'hard1080' else 'round 4'})",
    "",
    f"{what} at "
    f"{len(rows)} seeds (same chkpnt{TRAIN_ITERS}, seed varies the finetune "
    f"camera shuffle; `scripts/e2e_seed_variance.py`, "
    f"{(time.time()-t0)/60:.0f} min):",
    "",
    "| seed | [2s] GSS+shortFT | [2t] opacity+shortFT | GSS margin |"
    + ("" if args.skip_control else " [1b] ctrl |"),
    "|---|---|---|---|" + ("" if args.skip_control else "---|"),
]
for seed, p2s, p2t, p1b in rows:
    lines.append(f"| {seed} | {p2s:.2f} | {p2t:.2f} | {p2s-p2t:+.2f} dB |"
                 + ("" if args.skip_control else f" {p1b:.2f} |"))
lines += [
    "",
    f"- [2s] PSNR {stat(p2s_all)}; [2t] {stat(p2t_all)}"
    + ("." if args.skip_control else f"; [1b] {stat(p1b_all)}."),
    f"- GSS-vs-opacity margin: **{np.mean(margins):+.2f} dB mean** "
    f"(range {min(margins):+.2f}..{max(margins):+.2f}) — "
    + ("every seed positive; the margin clears the seed-to-seed spread."
       if min(margins) > 0 and np.mean(margins) > (max(margins) - min(margins)) / 2
       else "see per-seed rows; interpret against the spread."),
    f"- Seed-to-seed spread of a single finetune configuration "
    f"(max-min): [2s] {max(p2s_all)-min(p2s_all):.2f} dB, "
    f"[2t] {max(p2t_all)-min(p2t_all):.2f} dB"
    + ("" if args.skip_control else
       f", [1b] {max(p1b_all)-min(p1b_all):.2f} dB")
    + " — the yardstick for calling a full-budget gap 're-convergence noise'.",
]
report = Path(REPO / ("E2E_TPU_hard1080.md" if args.preset == "hard1080"
                      else "E2E_TPU_hard.md"))
with report.open("a") as f:
    f.write("\n".join(lines) + "\n")
print(f"appended seed-variance footnote to {report}")
