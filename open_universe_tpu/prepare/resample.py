"""API-parity alias: ``python -m open_universe_tpu.prepare.resample`` mirrors
the reference's ``open_universe.prepare.resample`` entry point
(/root/reference/open_universe/prepare/resample.py); the implementation lives
in bin/resample.py."""
from ..bin.resample import *  # noqa: F401,F403
from ..bin.resample import main

if __name__ == "__main__":
    main()
