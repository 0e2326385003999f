"""Post-run report for a ShapesWSSS learning-dynamics run.

Prints a markdown trajectory table from metrics.jsonl (CAM/Seg mIoU per
validation, both networks), the best-checkpoint bookkeeping, and dumps
qualitative prediction panels for a few val images from the saved best_seg
checkpoint (via the standard eval engine's save_dir path).

Usage:
  python scripts/report_synth.py --out_dir work_dirs/synthrun_r3 \
      --data_root work_dirs/synthdata [--panels 6]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split_dir", default="")
    ap.add_argument("--panels", type=int, default=6)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    rows = []
    with open(os.path.join(args.out_dir, "metrics.jsonl")) as f:
        for ln in f:
            r = json.loads(ln)
            if r.get("kind") == "val":
                rows.append(r)

    by_iter = {}
    for r in rows:
        by_iter.setdefault(r["iter"], {})[r["model"]] = r
    print("| iter | ON CAM | ON Seg | AN CAM | AN Seg |")
    print("|---|---|---|---|---|")
    for it in sorted(by_iter):
        d = by_iter[it]
        f = lambda m, k: f"{100*d[m][k]:.1f}" if m in d else "-"
        print(f"| {it} | {f('ON','CAM')} | {f('ON','Seg_vd')} | "
              f"{f('AN','CAM')} | {f('AN','Seg_vd')} |")

    # final lines from print.out (best bookkeeping + finaleval tables)
    po = os.path.join(args.out_dir, "print.out")
    if os.path.exists(po):
        lines = open(po).read().splitlines()
        for ln in lines:
            if "Best val" in ln or "Final Model Result" in ln:
                print("\n" + ln)

    if args.panels:
        from cosa_tpu.config import voc_config
        from cosa_tpu.data.loader import build_val_dataset
        from cosa_tpu.eval.engine import evaluate
        from cosa_tpu.models import build_model
        from cosa_tpu.train import checkpoint as ckpt
        from cosa_tpu.train.state import create_train_state
        import jax

        cfg = voc_config(
            data_root=args.data_root,
            split_dir=args.split_dir or os.path.join(args.data_root, "splits"),
            pretrained=False, lr=args.lr,
        )
        model = build_model(cfg)
        state = create_train_state(cfg, model, 1)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state.student
        )
        params = ckpt.load_best(args.out_dir, "seg", abstract)
        ds = build_val_dataset(cfg)
        save_dir = os.path.join(args.out_dir, "qualitative")
        res = evaluate(cfg, model, params, ds, max_images=args.panels,
                       save_dir=save_dir)
        print(f"\nqualitative panels -> {save_dir} "
              f"(subset Seg_vd {100*res['Seg_vd']['miou']:.1f})")


if __name__ == "__main__":
    main()
