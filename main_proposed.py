"""Entry point mirroring reference main_proposed.py (L3-query breakfast)."""
from r3d_tpu.cli.opts import run_from_argv

if __name__ == "__main__":
    import sys

    if "--model" not in sys.argv:
        sys.argv += ["--model", "futr_proposed"]
    run_from_argv("breakfast_proposed")
