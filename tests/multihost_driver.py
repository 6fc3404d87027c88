"""One process of a 2-process CPU 'pod' for the multi-host tests.

Launched by tests/test_multihost.py twice (process_id 0 and 1), each with
``--xla_force_host_platform_device_count=4`` in XLA_FLAGS, so the global
topology is 2 processes x 4 local = 8 devices.  Exercises, for real, the
paths every single-process test only reasons about:

* ``jax.distributed.initialize`` with an explicit coordinator (the same
  call train.py's multihost block makes, train.py:57-89),
* rank gating (only process 0 writes run artifacts / TensorBoard),
* global-batch sharding onto a mesh that spans processes,
* the all-processes-enter-orbax-save barrier (Trainer.save docstring) and
  a cross-process restore (``--resume``).

Reference equivalent: Lightning DDP multi-node
(/root/reference/open_universe/utils/ddp.py:24-66, config/trainer/
default.yaml:7-9), which gets the same guarantees from torch.distributed.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--data", required=True)
    ap.add_argument("--run", required=True)
    ap.add_argument("--max-steps", type=int, default=2)
    ap.add_argument("--resume", action="store_true",
                    help="restore from <run>/checkpoints before training")
    args = ap.parse_args()

    import jax

    # sitecustomize pins JAX_PLATFORMS=axon; must flip to cpu before first
    # backend use (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    # both processes compile identical graphs, and the resume launch repeats
    # them: share the repo-local persistent cache (same one the multichip
    # dryrun primes; concurrent writers are safe - entries are content-
    # addressed and written atomically)
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # shutdown_timeout raised from the 300 s default: on this contended
    # 1-core host rank-0's end-of-run finalization (TB flush, orbax commit)
    # can lag rank-1's exit by minutes, and the default barrier killed the
    # pod (r3: "Shutdown barrier timed out, 1/2 tasks reached")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id,
                               shutdown_timeout_seconds=1800)
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 4, jax.local_devices()
    assert jax.device_count() == 4 * args.num_processes

    # Initialize the Gloo collective context NOW, while both processes are
    # within seconds of each other: context creation has a hardcoded 30 s
    # KV-store rendezvous timeout ("Gloo context initialization failed:
    # DEADLINE_EXCEEDED"), and on this contended 1-core host the two
    # processes' serialized train-step compiles can skew their arrival at
    # the first in-step allreduce by minutes. Once the clique context
    # exists, later collectives wait under the (raised) XLA:CPU stuck
    # timeouts instead.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("multihost_driver:collective-warmup")

    from open_universe_tpu.configs.registry import instantiate
    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    cfg = compose("config", [
        "experiment=universepp_vb_16k",
        f"datamodule.datasets.vb-train-16k.audio_path={args.data}",
        # 0.13 s = 2080 samples: multiple of tot_ds=160 and longer than the
        # 2048-fft MRD branch window
        "datamodule.datasets.vb-train-16k.audio_len=0.13",
        "datamodule.train.dl_opts.batch_size=8",
        # tiny GAN so two steps compile+run in seconds per device
        "model.score_model.n_channels=4",
        "model.score_model.n_rff=8",
        "model.score_model.noise_cond_dim=32",
        "model.condition_model.n_channels=4",
        "model.condition_model.n_mels=16",
    ])
    model = instantiate(cfg["model"])
    dm = instantiate(cfg["datamodule"])
    trainer = Trainer(model, dm, Path(args.run), max_steps=args.max_steps,
                      val_check_interval=10_000, checkpoint_every=2,
                      log_every=1, seed=0, mesh=make_mesh(dp=8), config=cfg)
    trainer.fit(resume_from=(args.run if args.resume else None))
    trainer._wait_for_saves()

    import numpy as np

    step = int(jax.device_get(trainer.state["step"]))
    # one representative generator weight, fetched on every process: proves
    # the replicated params stayed in sync across the pod
    leaf = jax.tree_util.tree_leaves(trainer.state["params"])[0]
    digest = float(np.sum(np.asarray(jax.device_get(leaf), np.float64)))
    print(f"MULTIHOST_OK p{args.process_id} step={step} digest={digest:.10e}",
          flush=True)

    # same end-of-run choreography as train.py: sync before exit so the
    # faster rank doesn't enter the distributed shutdown barrier minutes
    # ahead of rank-0's finalization work
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("multihost_driver:done")


if __name__ == "__main__":
    main()
