"""Helpers to run the REFERENCE PyTorch models on CPU as parity oracles.

We import the reference from /root/reference (never copy it), patch the two
hard-coded ``.to('cuda')`` call sites so it runs on CPU, and provide
torch->flax weight-tree conversion.
"""

import sys
import types

import numpy as np

from conftest import reference_on_path

reference_on_path()

import torch  # noqa: E402


class RefArgs:
    """Stand-in for the reference argparse namespace (opts.py)."""

    def __init__(self, **kw):
        self.seg = True
        self.anticipate = True
        self.pos_emb = True
        self.input_type = "i3d_transcript"
        self.input_dim = 2048
        self.max_pos_len = 2000
        self.sample_rate = 1
        self.__dict__.update(kw)


def patch_cuda_free():
    """Make the reference models runnable on CPU: several forwards contain
    hard-coded ``.to('cuda')`` (e.g. futr_safuser_batchnormalization.py:88).
    Redirect any cuda target of Tensor.to to cpu, test-process-wide."""
    if getattr(torch.Tensor, "_r3d_to_patched", False):
        return
    orig_to = torch.Tensor.to

    def _is_cuda(a):
        return (isinstance(a, str) and a.startswith("cuda")) or (
            isinstance(a, torch.device) and a.type == "cuda"
        )

    def patched_to(self, *args, **kwargs):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = patched_to
    torch.Tensor._r3d_to_patched = True


def zero_dropout(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0


def t2n(t):
    return t.detach().cpu().numpy()


def linear(params, prefix, t_linear):
    params[prefix] = {"kernel": t2n(t_linear.weight).T, "bias": t2n(t_linear.bias)}


def layernorm(params, prefix, t_ln):
    params[prefix] = {"scale": t2n(t_ln.weight), "bias": t2n(t_ln.bias)}


def mha(params, prefix, t_mha):
    """torch nn.MultiheadAttention -> our MultiheadAttention param dict."""
    C = t_mha.embed_dim
    w = t2n(t_mha.in_proj_weight)
    b = t2n(t_mha.in_proj_bias)
    params[prefix] = {
        "q_proj": {"kernel": w[:C].T, "bias": b[:C]},
        "k_proj": {"kernel": w[C : 2 * C].T, "bias": b[C : 2 * C]},
        "v_proj": {"kernel": w[2 * C :].T, "bias": b[2 * C :]},
        "out_proj": {
            "kernel": t2n(t_mha.out_proj.weight).T,
            "bias": t2n(t_mha.out_proj.bias),
        },
    }


def decoder_layer(t_layer):
    p = {}
    mha(p, "self_attn", t_layer.self_attn)
    mha(p, "cross_attn", t_layer.multihead_attn)
    ffn = {}
    linear(ffn, "linear1", t_layer.linear1)
    linear(ffn, "linear2", t_layer.linear2)
    p["ffn"] = ffn
    layernorm(p, "norm1", t_layer.norm1)
    layernorm(p, "norm2", t_layer.norm2)
    layernorm(p, "norm3", t_layer.norm3)
    return p


def encoder_layer(t_layer):
    p = {}
    mha(p, "self_attn", t_layer.self_attn)
    ffn = {}
    linear(ffn, "linear1", t_layer.linear1)
    linear(ffn, "linear2", t_layer.linear2)
    p["ffn"] = ffn
    layernorm(p, "norm1", t_layer.norm1)
    layernorm(p, "norm2", t_layer.norm2)
    return p


def transformer_params(t_transformer, use_encoder=False):
    p = {"decoder": {}}
    for i, layer in enumerate(t_transformer.decoder.layers):
        p["decoder"][f"layer{i}"] = decoder_layer(layer)
    layernorm(p["decoder"], "norm", t_transformer.decoder.norm)
    if use_encoder:
        p["encoder"] = {}
        for i, layer in enumerate(t_transformer.encoder.layers):
            p["encoder"][f"layer{i}"] = encoder_layer(layer)
    return p


def futr_params(t_model, use_encoder=False):
    """Reference model/futr.py FUTR -> our FUTR param tree."""
    p = {"embed": {}, "heads": {}}
    linear(p["embed"], "input_embed", t_model.input_embed)
    p["pos_embedding"] = t2n(t_model.pos_embedding)
    p["query_embed"] = t2n(t_model.query_embed.weight)
    p["transformer"] = transformer_params(t_model.transformer, use_encoder)
    linear(p["heads"], "fc", t_model.fc)
    linear(p["heads"], "fc_len", t_model.fc_len)
    linear(p["heads"], "fc_seg", t_model.fc_seg)
    return p


def fuser_block_params(t_block):
    """timm Block -> flat FuserBlock param dict."""
    return {
        "norm1_scale": t2n(t_block.norm1.weight),
        "norm1_bias": t2n(t_block.norm1.bias),
        "qkv_kernel": t2n(t_block.attn.qkv.weight).T,
        "proj_kernel": t2n(t_block.attn.proj.weight).T,
        "proj_bias": t2n(t_block.attn.proj.bias),
        "norm2_scale": t2n(t_block.norm2.weight),
        "norm2_bias": t2n(t_block.norm2.bias),
        "mlp1_kernel": t2n(t_block.mlp.mlp[0].weight).T,
        "mlp1_bias": t2n(t_block.mlp.mlp[0].bias),
        "mlp2_kernel": t2n(t_block.mlp.mlp[2].weight).T,
        "mlp2_bias": t2n(t_block.mlp.mlp[2].bias),
    }


def fusion_params(t_model, use_encoder=False):
    """Reference futr_safuser_batchnormalization FUTR -> our FUTRFusion tree.

    Returns (params, batch_stats).
    """
    p = futr_params_common(t_model, use_encoder)
    fuser = {"alpha": t2n(t_model.fuser.alpha)}
    bn_stats = {}
    for name, t_bn in [("bn_rgb", t_model.fuser.bn_rgb), ("bn_depth", t_model.fuser.bn_depth)]:
        fuser[name] = {"scale": t2n(t_bn.weight), "bias": t2n(t_bn.bias)}
        bn_stats[name] = {
            "mean": t2n(t_bn.running_mean),
            "var": t2n(t_bn.running_var),
        }
    safuser = {}
    for i, blk in enumerate(t_model.fuser.blocks):
        safuser[f"block{i}"] = fuser_block_params(blk)
    safuser["norm_scale"] = t2n(t_model.fuser.norm.weight)
    safuser["norm_bias"] = t2n(t_model.fuser.norm.bias)
    fuser["safuser"] = safuser
    p["fuser"] = fuser

    depth_embed = {}
    linear(depth_embed, "depth_projection", t_model.depth_projection)
    layernorm(depth_embed, "depth_layernorm", t_model.depth_layernorm)
    p["depth_embed"] = depth_embed

    batch_stats = {"fuser": bn_stats}
    return p, batch_stats


def proposed_params(t_model, use_encoder=False):
    """Reference model/futr_proposed.py or futr_unsupervised_depth.py ->
    our FUTRUnsupervised(query_source='gt'/'depth') tree.  The caller merges
    this over its init params (our model carries an fc_l3 head the
    futr_proposed reference lacks; its output isn't compared)."""
    p = {"embed": {}, "heads": {}}
    linear(p["embed"], "input_embed", t_model.input_embed)
    p["pos_embedding"] = t2n(t_model.pos_embedding)
    p["transformer"] = transformer_params(t_model.transformer, use_encoder)
    linear(p["heads"], "fc", t_model.fc)
    linear(p["heads"], "fc_len", t_model.fc_len)
    linear(p["heads"], "fc_seg", t_model.fc_seg)
    if hasattr(t_model, "query_embed"):
        p["query_embed"] = {"embedding": t2n(t_model.query_embed.weight)}
    if hasattr(t_model, "depth_projection"):
        de = {}
        linear(de, "depth_projection", t_model.depth_projection)
        layernorm(de, "depth_layernorm", t_model.depth_layernorm)
        p["depth_embed"] = de
    if hasattr(t_model, "fc_l3"):
        linear(p, "fc_l3", t_model.fc_l3)
    return p


def lstm_params(t_lstm):
    """torch nn.LSTM (bidirectional, num_layers) -> our LSTMStack tree.
    Cell order: layer-major, fwd before bwd (LSTMStack builds them in that
    order, so flax auto-names them OptimizedLSTMCell_{2*layer+dir})."""
    out = {}
    for layer in range(t_lstm.num_layers):
        for d, suffix in ((0, ""), (1, "_reverse")):
            w_ih = t2n(getattr(t_lstm, f"weight_ih_l{layer}{suffix}"))
            w_hh = t2n(getattr(t_lstm, f"weight_hh_l{layer}{suffix}"))
            b = t2n(getattr(t_lstm, f"bias_ih_l{layer}{suffix}")) + t2n(
                getattr(t_lstm, f"bias_hh_l{layer}{suffix}")
            )
            h = w_hh.shape[1]
            cell = {}
            # torch gate order i, f, g, o (chunks of h rows); flax keeps one
            # bias per gate on the hidden dense -> bias_ih + bias_hh
            for gi, gate in enumerate(("i", "f", "g", "o")):
                rows = slice(gi * h, (gi + 1) * h)
                cell[f"i{gate}"] = {"kernel": w_ih[rows].T}
                cell[f"h{gate}"] = {"kernel": w_hh[rows].T, "bias": b[rows]}
            out[f"OptimizedLSTMCell_{2 * layer + d}"] = cell
    return out


def rnn_baseline_params(t_model):
    """Reference model/rnn.py FUTR -> our RNNAnticipator tree."""
    p = {"embed": {}}
    linear(p["embed"], "input_embed", t_model.input_embed)
    p["rnn"] = lstm_params(t_model.rnn)
    linear(p, "rnn_fc", t_model.rnn_fc)
    linear(p, "fc", t_model.fc)
    linear(p, "fc_len", t_model.fc_len)
    linear(p, "fc_seg", t_model.fc_seg)
    return p


def cnn_baseline_params(t_model):
    """Reference model/cnn.py FUTR -> our CNNAnticipator tree."""
    p = {"embed": {}}
    linear(p["embed"], "input_embed", t_model.input_embed)
    linear(p, "fc", t_model.fc)
    linear(p, "fc_len", t_model.fc_len)
    linear(p, "fc_seg", t_model.fc_seg)
    return p


def _wn_conv(t_conv):
    """weight-normed torch Conv1d -> WNCausalConv {v, g, bias}."""
    import torch as _t

    with _t.no_grad():
        try:  # new-style parametrization
            v = t_conv.parametrizations.weight.original1
            g = t_conv.parametrizations.weight.original0
        except AttributeError:  # legacy weight_norm
            v = t_conv.weight_v
            g = t_conv.weight_g
    return {
        "v": t2n(v).transpose(2, 1, 0),       # [out, in, k] -> [k, in, out]
        "g": t2n(g).reshape(-1),
        "bias": t2n(t_conv.bias),
    }


def tcn_baseline_params(t_model):
    """Reference model/tcn.py MustafaNet1DTCN -> our TCNAnticipator tree."""
    p = {}
    for i, block in enumerate(t_model.tcn_local.network):
        p[f"block{i}_conv1"] = _wn_conv(block.conv1)
        p[f"block{i}_conv2"] = _wn_conv(block.conv2)
        if block.downsample is not None:
            p[f"block{i}_down"] = {
                "kernel": t2n(block.downsample.weight).transpose(2, 1, 0),
                "bias": t2n(block.downsample.bias),
            }
    p["regression"] = {
        "kernel": t2n(t_model.regression.weight).transpose(2, 1, 0),
        "bias": t2n(t_model.regression.bias),
    }
    return p


def futr_params_common(t_model, use_encoder=False):
    p = {"embed": {}, "heads": {}}
    linear(p["embed"], "input_embed", t_model.input_embed)
    p["pos_embedding"] = t2n(t_model.pos_embedding)
    p["query_embed"] = t2n(t_model.query_embed.weight)
    p["transformer"] = transformer_params(t_model.transformer, use_encoder)
    linear(p["heads"], "fc", t_model.fc)
    linear(p["heads"], "fc_len", t_model.fc_len)
    linear(p["heads"], "fc_seg", t_model.fc_seg)
    return p


def conv2d(params, prefix, t_conv):
    """torch nn.Conv2d [out,in,kh,kw] -> flax nn.Conv (NHWC) [kh,kw,in,out]."""
    params[prefix] = {
        "kernel": t2n(t_conv.weight).transpose(2, 3, 1, 0),
        "bias": t2n(t_conv.bias),
    }


def gaze_params(t_model, use_encoder=False):
    """Reference model/futr_unsupervised_multimodal.py ->
    FUTRUnsupervised(query_source='gaze') tree. The reference ctor builds a
    query_embed it never uses in forward (multimodal.py:54) — not mapped."""
    p = {"embed": {}, "heads": {}, "gaze_cnn": {}}
    linear(p["embed"], "input_embed", t_model.input_embed)
    p["pos_embedding"] = t2n(t_model.pos_embedding)
    p["transformer"] = transformer_params(t_model.transformer, use_encoder)
    linear(p["heads"], "fc", t_model.fc)
    linear(p["heads"], "fc_len", t_model.fc_len)
    linear(p["heads"], "fc_seg", t_model.fc_seg)
    for name in ("conv1", "conv2", "conv3"):
        conv2d(p["gaze_cnn"], name, getattr(t_model.gaze_cnn, name))
    return p
