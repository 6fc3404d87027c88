"""One-command quality-parity harness against the reference's published
results (reference README.md:101-115, produced by bin.make_table on the
VB-DEMAND 16 kHz test set).

    python -m open_universe_tpu.bin.parity \
        --model line-corporation/open-universe:plusplus \
        --noisy-dir data/vb-demand-16k/test/noisy \
        --clean-dir data/vb-demand-16k/test/clean \
        --output exp/parity

Pipeline: ingest the checkpoint (local ``*.ckpt`` or HF ``repo[:rev]``,
reference model_loader.py:62-137) -> enhance the noisy tree (bin.enhance)
-> run the metric suite vs the clean tree (bin.eval_metrics) -> print and
save a delta table vs the published row.

Offline-testable end to end with a synthetic checkpoint + synthetic wavs
(tests/test_parity_harness.py); when network/weights are available the same
command runs the real north-star check (see BASELINE.md).
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

log = logging.getLogger(__name__)

# Published VB-DEMAND 16 kHz test results (reference README.md:107-108;
# metric naming per README.md:110-115).  Keys are our metric names.
REFERENCE_RESULTS = {
    "plusplus": {  # UNIVERSE++ (UNIVERSE++ row of the README table)
        "si-sdr": 18.624,
        "pesq-wb": 3.017,
        "stoi-ext": 0.864,
        "lsd": 4.867,
        "lps": 0.937,
        "dnsmos-ovr": 3.200,
        "dnsmos-sig": 3.489,
        "dnsmos-bak": 4.040,
    },
    "original": {  # UNIVERSE row
        "si-sdr": 17.600,
        "pesq-wb": 2.830,
        "stoi-ext": 0.844,
        "lsd": 6.318,
        "lps": 0.920,
        "dnsmos-ovr": 3.157,
        "dnsmos-sig": 3.457,
        "dnsmos-bak": 4.013,
    },
}

# metrics where higher is better (delta > 0 == we beat the reference)
_HIGHER_BETTER = {"si-sdr", "pesq-wb", "pesq-nb", "stoi", "stoi-ext", "lps",
                  "dnsmos-ovr", "dnsmos-sig", "dnsmos-bak", "sdr"}

DEFAULT_METRICS = ["pesq-wb", "si-sdr", "stoi-ext", "lsd"]


def build_report(summary: dict, baseline: dict, metrics) -> dict:
    rows = []
    for m in metrics:
        ours = summary.get(m)
        ref = baseline.get(m)
        row = {"metric": m, "ours": ours, "reference": ref}
        if ours is not None and ref is not None:
            delta = ours - ref
            row["delta"] = delta
            row["better"] = bool(delta >= 0) if m in _HIGHER_BETTER \
                else bool(delta <= 0)
        rows.append(row)
    compared = [r for r in rows if "delta" in r]
    return {
        "n_files": summary.get("number"),
        "rows": rows,
        # parity requires at least one metric actually compared — an
        # all-failed metric pass must not read as a green light
        "parity": bool(compared) and all(r["better"] for r in compared),
        "n_compared": len(compared),
    }


def format_table(report: dict) -> str:
    lines = [f"{'metric':<12} {'ours':>10} {'reference':>10} {'delta':>9}  "]
    for r in report["rows"]:
        ours = "n/a" if r["ours"] is None else f"{r['ours']:.3f}"
        ref = "n/a" if r["reference"] is None else f"{r['reference']:.3f}"
        delta = f"{r['delta']:+.3f}" if "delta" in r else "n/a"
        mark = "" if "better" not in r else ("✓" if r["better"] else "✗")
        lines.append(f"{r['metric']:<12} {ours:>10} {ref:>10} {delta:>9} {mark}")
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="enhance + evaluate + compare vs published results")
    parser.add_argument("--model", type=str, required=True,
                        help="local *.ckpt or HF repo[:revision]")
    parser.add_argument("--noisy-dir", type=Path, required=True)
    parser.add_argument("--clean-dir", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True,
                        help="run dir; enhanced wavs + reports land here")
    parser.add_argument("--metrics", nargs="+", default=DEFAULT_METRICS)
    parser.add_argument("--reference", choices=sorted(REFERENCE_RESULTS),
                        default="plusplus",
                        help="published README row to compare against")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--bucket-seconds", type=float, default=1.0)
    parser.add_argument("--n-steps", type=int, default=None,
                        help="diffusion steps override (model default: 8)")
    parser.add_argument("--limit", type=int, default=None,
                        help="only process the first N files (smoke runs)")
    parser.add_argument("--skip-enhance", action="store_true",
                        help="reuse an existing <output>/enhanced tree")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    args.output.mkdir(parents=True, exist_ok=True)
    enhanced_dir = args.output / "enhanced"

    noisy_dir = args.noisy_dir
    if args.limit is not None:
        # materialize a limited file list via a temp subtree of symlinks
        subset = args.output / "noisy_subset"
        subset.mkdir(exist_ok=True)
        from .enhance import AUDIO_EXTS

        wavs = sorted(p for p in args.noisy_dir.rglob("*")
                      if p.suffix.lower() in AUDIO_EXTS)[: args.limit]
        for w in wavs:
            link = subset / w.name
            if not link.exists():
                link.symlink_to(w.resolve())
        noisy_dir = subset

    if not args.skip_enhance:
        from .enhance import main as enhance_main

        enh_args = [str(noisy_dir), str(enhanced_dir),
                    "--model", args.model,
                    "--batch-size", str(args.batch_size),
                    "--bucket-seconds", str(args.bucket_seconds)]
        if args.n_steps is not None:
            enh_args += ["--n_steps", str(args.n_steps)]
        rc = enhance_main(enh_args)
        if rc != 0:
            log.error("enhancement failed (rc=%d)", rc)
            return rc

    from .eval_metrics import main as eval_main

    rc = eval_main([str(enhanced_dir), "--ref_path", str(args.clean_dir),
                    "--metrics", *args.metrics])
    if rc != 0:
        log.error("metric evaluation failed (rc=%d)", rc)
        return rc

    summary_path = args.output / "enhanced_summary.json"
    with open(summary_path) as f:
        summary = json.load(f)

    report = build_report(summary, REFERENCE_RESULTS[args.reference],
                          args.metrics)
    report["model"] = args.model
    report["reference_row"] = args.reference
    report_path = args.output / "parity_report.json"
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)

    print(format_table(report))
    print(json.dumps({"parity": report["parity"],
                      "report": str(report_path)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
