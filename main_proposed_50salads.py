"""Entry point mirroring reference main_proposed_50salads.py."""
from r3d_tpu.cli.opts import run_from_argv

if __name__ == "__main__":
    run_from_argv("50salads_proposed")
