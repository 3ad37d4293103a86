"""Entry point mirroring reference main_nturgbd.py (thin shim over r3d_tpu.cli)."""
from r3d_tpu.cli.opts import run_from_argv

if __name__ == "__main__":
    run_from_argv("nturgbd")
