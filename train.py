"""Training entry point.

Usage (mirrors the reference's hydra CLI, reference train.py):

    python train.py experiment=universepp_vb_16k [key=value ...]

Composes config/ (defaults + experiment overlay + dotlist overrides), seeds
all RNGs, builds the datamodule/model/trainer, and runs fit (and optionally
test).  Run dir: exp/<experiment>/<datetime>/.
"""
import argparse
import datetime
import logging
import os
import sys
from pathlib import Path

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
log = logging.getLogger("train")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("overrides", nargs="*",
                        help="hydra-style overrides: group=choice or a.b=val")
    parser.add_argument("--config-dir", default=str(Path(__file__).parent / "config"))
    args = parser.parse_args(argv)

    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.configs.registry import instantiate

    cfg = compose(args.config_dir, args.overrides)
    experiment = cfg.get("_choices_", {}).get("experiment", "default")

    import numpy as np
    import jax

    # platform=cpu (or tpu/...) forces the jax backend — the JAX_PLATFORMS
    # env var is not enough on hosts whose sitecustomize pins it, and
    # jax.config.update only works before the first backend use, so this
    # must run here, before any jax array/device call below
    platform = cfg.get("platform")
    if platform:
        # on jax 0.9 this silently no-ops if a backend is already
        # initialized, so verify the effective backend afterwards (below,
        # AFTER the multihost block: jax.default_backend() itself
        # initializes the backend, and jax.distributed.initialize must run
        # before any backend use) instead of relying on an exception
        jax.config.update("jax_platforms", str(platform))

    # multi-host pods: initialize the distributed runtime before any backend
    # use.  With bare `multihost: true`, jax.distributed.initialize()
    # autodetects the cluster (Cloud TPU metadata / Slurm / GKE).  For a
    # hand-rolled cluster pass the connection explicitly:
    #   multihost:
    #     coordinator_address: host0:1234
    #     num_processes: 2
    #     process_id: 0        # (or leave to per-host overrides)
    # This replaces the reference's Lightning DDP spawn + rank env plumbing
    # (reference utils/ddp.py).
    # persistent compilation cache: repeat launches (and the other processes
    # of a multi-host pod, which compile identical programs) hit warm
    # entries instead of recompiling. compile_cache=null disables.
    cache_dir = cfg.get("compile_cache", ".jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    mh = cfg.get("multihost")
    if mh:
        if isinstance(mh, dict):
            if (mh.get("coordinator_address") is not None
                    and mh.get("process_id") is None
                    and not any(os.environ.get(v) for v in
                                ("SLURM_JOB_ID", "TPU_WORKER_ID",
                                 "CLOUD_TPU_TASK_ID", "MEGASCALE_SLICE_ID"))):
                # jax.distributed.initialize can only autodetect process_id
                # under Cloud TPU/Slurm/GKE; on a hand-rolled cluster it must
                # be set per host (e.g. CLI override multihost.process_id=N)
                raise ValueError(
                    "multihost.coordinator_address is set but "
                    "multihost.process_id is not, and no supported cluster "
                    "environment was detected; pass multihost.process_id "
                    "per host (CLI override multihost.process_id=N)")
            jax.distributed.initialize(
                coordinator_address=mh.get("coordinator_address"),
                num_processes=mh.get("num_processes"),
                process_id=mh.get("process_id"),
                shutdown_timeout_seconds=int(
                    mh.get("shutdown_timeout_seconds", 1200)))
        else:
            jax.distributed.initialize()
        log.info("distributed: process %d / %d", jax.process_index(),
                 jax.process_count())
    if platform and jax.default_backend() != str(platform):
        raise RuntimeError(
            f"platform={platform} requested but the jax backend already "
            f"initialized to {jax.default_backend()!r}; set it before "
            "any jax array/device use (or launch a fresh process)")
    if mh:
        # eager collective warmup: initializes the communicator clique while
        # all processes are still aligned at startup (context creation has a
        # short rendezvous timeout on some backends — e.g. Gloo's 30 s on
        # XLA:CPU — while the processes' independent train-step compiles can
        # skew their arrival at the first real collective by minutes), and
        # fails fast on a mis-wired pod before any compile time is spent
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("train.py:collective-warmup")

    seed = cfg.get("seed", 0)
    np.random.seed(seed)
    import random as _random

    _random.seed(seed)

    log.info("devices: %s", jax.devices())

    dm = instantiate(cfg["datamodule"])
    model = instantiate(cfg["model"])

    # run dir mirrors the reference's pattern: datetime + cli overrides
    ov_tag = "_".join(o.replace("/", ".") for o in args.overrides
                      if not o.startswith("experiment="))[:128]
    run_name = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    if ov_tag:
        run_name += "_" + ov_tag
    run_dir = (Path(cfg.get("path", {}).get("exp_root", "exp")) / experiment
               / run_name)
    log.info("run dir: %s", run_dir)

    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    tcfg = cfg.get("trainer", {})
    mesh = make_mesh(dp=tcfg.get("mesh_dp"), tp=tcfg.get("mesh_tp", 1))
    trainer = Trainer(
        model, dm, run_dir,
        max_steps=tcfg.get("max_steps", 600000),
        val_check_interval=tcfg.get("val_check_interval", 5000),
        checkpoint_every=tcfg.get("checkpoint_every"),
        log_every=tcfg.get("log_every", 25),
        max_val_batches=tcfg.get("max_val_batches"),
        seed=seed,
        mesh=mesh,
        config={k: v for k, v in cfg.items() if not k.startswith("_")},
    )

    if cfg.get("train", True):
        trainer.fit(resume_from=cfg.get("ckpt_path"))
    if cfg.get("test", False):
        # real test-set evaluation (reference train.py:105-119): enhance the
        # test split and write test_results/test_summary JSON to the run dir
        trainer.test()

    if mh:
        # rank-0 does strictly more end-of-run work (TB flush, orbax commit
        # metadata, test summaries); sync before the interpreters exit so no
        # process races ahead into the distributed shutdown barrier and
        # times it out while rank-0 is still finalizing
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("train.py:done")


if __name__ == "__main__":
    main()
