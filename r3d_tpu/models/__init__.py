"""Model registry (reference model selection = comment-toggled imports,
main_utkinects.py:17-31; here a string -> module map)."""

from typing import Any

from r3d_tpu.config import ModelConfig
from r3d_tpu.models.futr import FUTR
from r3d_tpu.models.futr_fusion import FUTRFusion

_FUSION_MODELS = {
    "futr_fusion_bn",
    "futr_fusion_grad",
    "futr_fusion_vary",
    "futr_fusion_nox",
    "afft",
}


def is_fusion_model(name: str) -> bool:
    return name in _FUSION_MODELS


# Models whose forward signature is (features, query, src_pad_mask, query_len)
# — the FUTRUnsupervised family (reference call shape
# ``model(inputs, query, mode=...)``, train_unsupervised.py:288,
# predict_darai.py:318).  Trainer._model_inputs and Predictor build args from
# this list; a model missing here would silently receive the pad mask in the
# dead ``query`` slot and no mask at all.
QUERY_MODELS = (
    "futr_unsupervised",
    "futr_proposed",
    "futr_gaze",
    "futr_unsupervised_depth",
    "futr_unsupervised_temp2",
    "futr_unsupervised_temp3",
)


def model_needs_query(name: str) -> bool:
    return name in QUERY_MODELS


def build_model(cfg: ModelConfig, n_class: int) -> Any:
    if cfg.model == "futr":
        return FUTR(cfg, n_class)
    if cfg.model == "futr_baseline":
        # model/futr_baseline.py: futr + output['supcon'] = decoder output
        return FUTR(cfg, n_class, emit_supcon=True)
    if cfg.model in _FUSION_MODELS:
        return FUTRFusion(cfg, n_class)
    if cfg.model in (
        "futr_unsupervised", "futr_proposed", "futr_gaze", "futr_unsupervised_depth",
        "futr_unsupervised_temp2", "futr_unsupervised_temp3",
    ):
        from r3d_tpu.models.futr_unsupervised import FUTRUnsupervised

        source = {
            "futr_unsupervised": "self_attention",
            "futr_proposed": "gt",
            "futr_gaze": "gaze",
            "futr_unsupervised_depth": "depth",
            "futr_unsupervised_temp2": "self_attention",
            "futr_unsupervised_temp3": "self_attention",
        }[cfg.model]
        variant = (
            cfg.model[len("futr_unsupervised_"):]
            if cfg.model.startswith("futr_unsupervised_temp")
            else ""
        )
        return FUTRUnsupervised(cfg, n_class, query_source=source, variant=variant)
    if cfg.model == "rnn":
        from r3d_tpu.models.baselines import RNNAnticipator

        return RNNAnticipator(cfg, n_class)
    if cfg.model == "cnn":
        from r3d_tpu.models.baselines import CNNAnticipator

        return CNNAnticipator(cfg, n_class)
    if cfg.model == "tcn":
        from r3d_tpu.models.baselines import TCNAnticipator

        return TCNAnticipator(cfg, n_class)
    raise ValueError(f"unknown model {cfg.model!r}")
