"""Entry point mirroring reference main.py (breakfast/50salads FUTR baseline)."""
from r3d_tpu.cli.opts import run_from_argv

if __name__ == "__main__":
    run_from_argv("breakfast")
