"""r3d_tpu — a TPU-native rebuild of R3D (Rank-targeted multi-modal fusion for
long-term action anticipation, WACV 2026).

The reference implementation (olivesgatech/R3D, PyTorch/CUDA) is rebuilt here
from scratch as an idiomatic JAX/XLA/Pallas framework:

- ``r3d_tpu.data``     — dataset protocol (windowing / transcripts / padding),
                         bucketed host pipeline, dataset registry.
- ``r3d_tpu.models``   — FUTR encoder–decoder family + Rank-enhancing Token
                         Fuser variants, written in flax.linen.
- ``r3d_tpu.ops``      — Pallas TPU kernels (fused token-fusion, attention)
                         and the effective-rank regularizer (custom VJP).
- ``r3d_tpu.losses``   — anticipation / segmentation / focal / temporal-cluster
                         losses matching reference semantics (utils.py).
- ``r3d_tpu.train``    — one config-driven jitted train loop, optax AdamW +
                         linear-warmup-cosine, orbax checkpoints.
- ``r3d_tpu.eval``     — anticipation decode + MoC protocol.
- ``r3d_tpu.parallel`` — device mesh + sharding (dp/tp axes over ICI).
- ``r3d_tpu.cli``      — entry points mirroring the reference main_*.py.
"""

__version__ = "0.1.0"
