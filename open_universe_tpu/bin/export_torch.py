"""Export a trained orbax checkpoint as a reference-compatible torch .ckpt.

    python -m open_universe_tpu.bin.export_torch run_dir/ out.ckpt

Reads the run's config.yaml + latest orbax checkpoint, converts the params
(and EMA shadow, when present) into the torch state_dict layout of the
reference implementation, so the exported weights.ckpt + config.yaml pair can
be consumed by either framework's load_model.
"""
import argparse
import shutil
import sys
from pathlib import Path

import numpy as np
import yaml


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("run_dir", type=Path,
                        help="training run dir (with config.yaml + checkpoints/)")
    parser.add_argument("output", type=Path, help="output .ckpt path")
    parser.add_argument("--step", type=int, help="checkpoint step (default: "
                        "best.json when present, else last.json)")
    args = parser.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp
    import torch

    from ..configs.registry import instantiate
    from ..inference.model_loader import _resolve_orbax_step
    from ..inference.torch_convert import ordered_param_names, to_torch_state_dict

    with open(args.run_dir / "config.yaml") as f:
        config = yaml.safe_load(f)
    model = instantiate(config["model"])

    ckpt_dir = args.run_dir / "checkpoints"
    if args.step is not None:
        path = ckpt_dir / f"step_{args.step:08d}"
    else:
        path, _ = _resolve_orbax_step(args.run_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path.absolute())

    edm = bool(getattr(model, "with_edm", False))
    sd = to_torch_state_dict(model, state["params"], edm=edm)
    t_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    ckpt = {"state_dict": t_sd, "global_step": int(state["step"])}

    if "ema" in state:
        shadow_sd = to_torch_state_dict(
            model, {**state["params"], **state["ema"]["shadow"]}, edm=edm)
        subs = ["_edm_model" if edm else "score_model", "condition_model",
                "signal_decoupling_layer"]
        names = ordered_param_names(sd, subs)
        ckpt["ema"] = {
            "decay": model.train_kwargs.get("ema_decay", 0.999),
            "num_updates": int(state["ema"]["num_updates"]),
            "shadow_params": [
                torch.from_numpy(np.ascontiguousarray(shadow_sd[n]))
                for n in names],
        }

    args.output.parent.mkdir(parents=True, exist_ok=True)
    torch.save(ckpt, args.output)
    shutil.copy2(args.run_dir / "config.yaml",
                 args.output.parent / "config.yaml")
    print(f"exported {len(t_sd)} tensors (step {int(state['step'])}) "
          f"to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
