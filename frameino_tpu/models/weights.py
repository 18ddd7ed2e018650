"""HF-checkpoint weight loading: safetensors -> framework param pytrees.

Maps the released diffusers-format checkpoints (Wan2.2-TI2V-5B /
CogVideoX-I2V-5B bases and the FrameINO finetunes —
``uva-cv-lab/FrameINO_*`` model zoo, reference ``README.md:130-143``)
onto this framework's pure-functional parameter layouts:

- torch Linear [out, in] -> dense kernel [in, out] (transpose)
- Conv3d/Conv2d patch embeds (kernel == stride) -> flattened dense rows,
  channel-major (C, pt, ph, pw)
- VAE convs OIDHW -> DHWIO / OIHW -> HWIO; WanRMS_norm gamma [C,1,1(,1)]
  squeezed to [C]
- per-block tensors stacked along a leading 'layers' axis for lax.scan

Every loader validates shapes against the target config. Round-trip
tests (``tests/test_weights.py``) export a random param tree to a
torch-style state dict and load it back bit-exactly, so the name/layout
tables stay correct even without the multi-GB checkpoints present.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Read every *.safetensors under ``path`` (or a single file)."""
    from safetensors import safe_open
    files = []
    if os.path.isfile(path):
        files = [path]
    else:
        for name in sorted(os.listdir(path)):
            if name.endswith(".safetensors"):
                files.append(os.path.join(path, name))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    out = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


def _lin(sd, name):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _stack(layer_list):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *layer_list)


# ---------------------------------------------------------------------------
# Wan DiT (diffusers WanTransformer3DModel state dict)
# ---------------------------------------------------------------------------

def wan_dit_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Params:
    d = cfg.inner_dim
    pt, ph, pw = cfg.patch_size
    pe_w = sd["patch_embedding.weight"]            # [D, C, pt, ph, pw]
    params: Params = {
        "patch_embedding": {
            "kernel": np.ascontiguousarray(pe_w.reshape(d, -1).T),
            "bias": sd["patch_embedding.bias"],
        },
        "condition_embedder": {
            "time_embedder": {
                "linear_1": _lin(sd, "condition_embedder.time_embedder.linear_1"),
                "linear_2": _lin(sd, "condition_embedder.time_embedder.linear_2"),
            },
            "time_proj": _lin(sd, "condition_embedder.time_proj"),
            "text_embedder": {
                "linear_1": _lin(sd, "condition_embedder.text_embedder.linear_1"),
                "linear_2": _lin(sd, "condition_embedder.text_embedder.linear_2"),
            },
        },
        "norm_out_table": sd["scale_shift_table"],
        "proj_out": _lin(sd, "proj_out"),
    }
    if cfg.image_dim is not None:
        ie = {
            "norm1": {"weight": sd["condition_embedder.image_embedder.norm1.weight"],
                      "bias": sd["condition_embedder.image_embedder.norm1.bias"]},
            "ff": {"fc1": _lin(sd, "condition_embedder.image_embedder.ff.net.0.proj"),
                   "fc2": _lin(sd, "condition_embedder.image_embedder.ff.net.2")},
            "norm2": {"weight": sd["condition_embedder.image_embedder.norm2.weight"],
                      "bias": sd["condition_embedder.image_embedder.norm2.bias"]},
        }
        if cfg.pos_embed_seq_len is not None:
            ie["pos_embed"] = sd["condition_embedder.image_embedder.pos_embed"]
        params["condition_embedder"]["image_embedder"] = ie

    layers = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}."
        lp: Params = {
            "scale_shift_table": sd[b + "scale_shift_table"],
            "attn1": {
                "to_q": _lin(sd, b + "attn1.to_q"),
                "to_k": _lin(sd, b + "attn1.to_k"),
                "to_v": _lin(sd, b + "attn1.to_v"),
                "to_out": _lin(sd, b + "attn1.to_out.0"),
                "norm_q": {"weight": sd[b + "attn1.norm_q.weight"]},
                "norm_k": {"weight": sd[b + "attn1.norm_k.weight"]},
            },
            "attn2": {
                "to_q": _lin(sd, b + "attn2.to_q"),
                "to_k": _lin(sd, b + "attn2.to_k"),
                "to_v": _lin(sd, b + "attn2.to_v"),
                "to_out": _lin(sd, b + "attn2.to_out.0"),
                "norm_q": {"weight": sd[b + "attn2.norm_q.weight"]},
                "norm_k": {"weight": sd[b + "attn2.norm_k.weight"]},
            },
            "ffn": {
                "fc1": _lin(sd, b + "ffn.net.0.proj"),
                "fc2": _lin(sd, b + "ffn.net.2"),
            },
        }
        if cfg.cross_attn_norm:
            lp["norm2"] = {"weight": sd[b + "norm2.weight"],
                           "bias": sd[b + "norm2.bias"]}
        if cfg.added_kv_proj_dim is not None:
            lp["attn2"]["add_k_proj"] = _lin(sd, b + "attn2.add_k_proj")
            lp["attn2"]["add_v_proj"] = _lin(sd, b + "attn2.add_v_proj")
            lp["attn2"]["norm_added_k"] = {
                "weight": sd[b + "attn2.norm_added_k.weight"]}
        layers.append(lp)
    params["blocks"] = _stack(layers)

    import jax
    return jax.tree.map(jnp.asarray, params)


def wan_dit_to_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip validation + checkpoint export)."""
    import jax
    d = cfg.inner_dim
    pt, ph, pw = cfg.patch_size
    sd: Dict[str, np.ndarray] = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    pe = np.asarray(params["patch_embedding"]["kernel"])
    sd["patch_embedding.weight"] = np.ascontiguousarray(
        pe.T.reshape(d, cfg.in_channels, pt, ph, pw))
    sd["patch_embedding.bias"] = np.asarray(params["patch_embedding"]["bias"])
    ce = params["condition_embedder"]
    put_lin("condition_embedder.time_embedder.linear_1",
            ce["time_embedder"]["linear_1"])
    put_lin("condition_embedder.time_embedder.linear_2",
            ce["time_embedder"]["linear_2"])
    put_lin("condition_embedder.time_proj", ce["time_proj"])
    put_lin("condition_embedder.text_embedder.linear_1",
            ce["text_embedder"]["linear_1"])
    put_lin("condition_embedder.text_embedder.linear_2",
            ce["text_embedder"]["linear_2"])
    sd["scale_shift_table"] = np.asarray(params["norm_out_table"])
    put_lin("proj_out", params["proj_out"])

    from frameino_tpu.core.tree import unstack_layers
    for i, lp in enumerate(unstack_layers(params["blocks"], cfg.num_layers)):
        b = f"blocks.{i}."
        sd[b + "scale_shift_table"] = np.asarray(lp["scale_shift_table"])
        for an in ("attn1", "attn2"):
            put_lin(b + f"{an}.to_q", lp[an]["to_q"])
            put_lin(b + f"{an}.to_k", lp[an]["to_k"])
            put_lin(b + f"{an}.to_v", lp[an]["to_v"])
            put_lin(b + f"{an}.to_out.0", lp[an]["to_out"])
            sd[b + f"{an}.norm_q.weight"] = np.asarray(lp[an]["norm_q"]["weight"])
            sd[b + f"{an}.norm_k.weight"] = np.asarray(lp[an]["norm_k"]["weight"])
        put_lin(b + "ffn.net.0.proj", lp["ffn"]["fc1"])
        put_lin(b + "ffn.net.2", lp["ffn"]["fc2"])
        if "norm2" in lp:
            sd[b + "norm2.weight"] = np.asarray(lp["norm2"]["weight"])
            sd[b + "norm2.bias"] = np.asarray(lp["norm2"]["bias"])
    return sd


def load_wan_dit_weights(path: str, cfg) -> Params:
    return wan_dit_from_state_dict(load_safetensors_dir(path), cfg)


# ---------------------------------------------------------------------------
# UMT5 / T5 encoder (transformers state dict)
# ---------------------------------------------------------------------------

def t5_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Params:
    enc = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    shared = "shared.weight" if "shared.weight" in sd else \
        enc + "embed_tokens.weight"
    layers = []
    for i in range(cfg.num_layers):
        b = f"{enc}block.{i}.layer."
        p: Params = {
            "attn": {n: _lin(sd, b + f"0.SelfAttention.{n}")
                     for n in ("q", "k", "v", "o")},
            "attn_norm": {"weight": sd[b + "0.layer_norm.weight"]},
            "ffn_norm": {"weight": sd[b + "1.layer_norm.weight"]},
            "ffn": {"wi_1": _lin(sd, b + "1.DenseReluDense.wi_1"),
                    "wo": _lin(sd, b + "1.DenseReluDense.wo")},
        }
        if cfg.gated_act:
            p["ffn"]["wi_0"] = _lin(sd, b + "1.DenseReluDense.wi_0")
        rb = b + "0.SelfAttention.relative_attention_bias.weight"
        if cfg.per_layer_relative_bias:
            p["rel_bias"] = sd[rb]
        layers.append(p)
    params = {
        "embed_tokens": sd[shared],
        "final_norm": {"weight": sd[enc + "final_layer_norm.weight"]},
        "layers": _stack(layers),
    }
    if not cfg.per_layer_relative_bias:
        params["rel_bias"] = sd[
            enc + "block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
    import jax
    return jax.tree.map(jnp.asarray, params)


def load_t5_weights(path: str, cfg) -> Params:
    return t5_from_state_dict(load_safetensors_dir(path), cfg)


# ---------------------------------------------------------------------------
# Wan VAE (diffusers AutoencoderKLWan state dict)
# ---------------------------------------------------------------------------

def _cconv(sd, name):
    """WanCausalConv3d weight OIDHW -> DHWIO."""
    return {"kernel": np.ascontiguousarray(
        sd[f"{name}.weight"].transpose(2, 3, 4, 1, 0)),
        "bias": sd[f"{name}.bias"]}


def _conv2d(sd, name):
    return {"kernel": np.ascontiguousarray(
        sd[f"{name}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{name}.bias"]}


def _rms(sd, name):
    g = sd[f"{name}.gamma"]
    return {"gamma": g.reshape(g.shape[0])}


def _vae_res(sd, name):
    p = {
        "kind": None,
        "norm1": _rms(sd, f"{name}.norm1"),
        "conv1": _cconv(sd, f"{name}.conv1"),
        "norm2": _rms(sd, f"{name}.norm2"),
        "conv2": _cconv(sd, f"{name}.conv2"),
    }
    if f"{name}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _cconv(sd, f"{name}.conv_shortcut")
    from frameino_tpu.core.tree import meta
    p["kind"] = meta("res")
    return p


def _vae_attn(sd, name):
    qkv = sd[f"{name}.to_qkv.weight"]         # [3C, C, 1, 1]
    proj = sd[f"{name}.proj.weight"]
    from frameino_tpu.core.tree import meta
    return {
        "kind": meta("attn"),
        "norm": {"gamma": sd[f"{name}.norm.gamma"].reshape(-1)},
        "to_qkv": {"kernel": np.ascontiguousarray(qkv[:, :, 0, 0].T),
                   "bias": sd[f"{name}.to_qkv.bias"]},
        "proj": {"kernel": np.ascontiguousarray(proj[:, :, 0, 0].T),
                 "bias": sd[f"{name}.proj.bias"]},
    }


def _vae_resample(sd, name, mode):
    from frameino_tpu.core.tree import meta
    p = {"kind": meta(mode)}
    # spatial conv index inside nn.Sequential: 1 for both modes
    p["conv"] = _conv2d(sd, f"{name}.resample.1")
    if f"{name}.time_conv.weight" in sd:
        p["time_conv"] = _cconv(sd, f"{name}.time_conv")
    return p


def wan_vae_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Params:
    """Maps diffusers AutoencoderKLWan names. Supports both the plain
    (2.1) and residual (2.2) block layouts."""
    import jax
    from frameino_tpu.core.tree import meta

    dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
    enc: Params = {"conv_in": _cconv(sd, "encoder.conv_in"),
                   "down_blocks": []}
    if cfg.is_residual:
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            last = i == len(cfg.dim_mult) - 1
            t_down = cfg.temperal_downsample[i] if not last else False
            down_flag = not last
            base = f"encoder.down_blocks.{i}"
            blk = {
                "kind": meta("res_down"),
                "out_dim": meta(dout),
                "factor_t": meta(2 if t_down else 1),
                "factor_s": meta(2 if down_flag else 1),
                "resnets": [_vae_res(sd, f"{base}.resnets.{j}")
                            for j in range(cfg.num_res_blocks)],
                "downsampler": None,
                "down_mode": meta("downsample3d" if t_down
                                  else "downsample2d"),
            }
            if down_flag:
                blk["downsampler"] = _vae_resample(
                    sd, f"{base}.downsampler",
                    "downsample3d" if t_down else "downsample2d")
            enc["down_blocks"].append(blk)
    else:
        # flat ModuleList ordering: res x N (+attn) per level + resample
        li = 0
        scale = 1.0
        for i in range(len(cfg.dim_mult)):
            for _ in range(cfg.num_res_blocks):
                enc["down_blocks"].append(
                    _vae_res(sd, f"encoder.down_blocks.{li}"))
                li += 1
                if scale in cfg.attn_scales:
                    enc["down_blocks"].append(
                        _vae_attn(sd, f"encoder.down_blocks.{li}"))
                    li += 1
            if i != len(cfg.dim_mult) - 1:
                mode = "downsample3d" if cfg.temperal_downsample[i] \
                    else "downsample2d"
                enc["down_blocks"].append(
                    _vae_resample(sd, f"encoder.down_blocks.{li}", mode))
                li += 1
                scale /= 2.0
    enc["mid"] = {
        "res1": _vae_res(sd, "encoder.mid_block.resnets.0"),
        "attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "res2": _vae_res(sd, "encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = _rms(sd, "encoder.norm_out")
    enc["conv_out"] = _cconv(sd, "encoder.conv_out")

    dec_dims = [cfg.dec_base_dim * u for u in
                (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    dec: Params = {
        "conv_in": _cconv(sd, "decoder.conv_in"),
        "mid": {
            "res1": _vae_res(sd, "decoder.mid_block.resnets.0"),
            "attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
            "res2": _vae_res(sd, "decoder.mid_block.resnets.1"),
        },
        "up_blocks": [],
    }
    for i, (din, dout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        last = i == len(cfg.dim_mult) - 1
        up_flag = not last
        t_up = cfg.temperal_upsample[i] if up_flag else False
        base = f"decoder.up_blocks.{i}"
        blk = {
            "out_dim": meta(dout),
            "factor_t": meta(2 if t_up else 1),
            "resnets": [_vae_res(sd, f"{base}.resnets.{j}")
                        for j in range(cfg.num_res_blocks + 1)],
            "upsampler": None,
            "up_mode": meta("upsample3d" if t_up else "upsample2d"),
            "has_dup_shortcut": meta(cfg.is_residual and up_flag),
        }
        if up_flag:
            up_name = f"{base}.upsampler" if cfg.is_residual \
                else f"{base}.upsamplers.0"
            blk["upsampler"] = _vae_resample(
                sd, up_name, "upsample3d" if t_up else "upsample2d")
        dec["up_blocks"].append(blk)
    dec["norm_out"] = _rms(sd, "decoder.norm_out")
    dec["conv_out"] = _cconv(sd, "decoder.conv_out")

    params = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _cconv(sd, "quant_conv"),
        "post_quant_conv": _cconv(sd, "post_quant_conv"),
    }
    return jax.tree.map(jnp.asarray, params)


def load_wan_vae_weights(path: str, cfg) -> Params:
    return wan_vae_from_state_dict(load_safetensors_dir(path), cfg)


# ---------------------------------------------------------------------------
# CogVideoX DiT (diffusers CogVideoXTransformer3DModel state dict)
# ---------------------------------------------------------------------------

def cogvideox_dit_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Params:
    d = cfg.inner_dim
    p = cfg.patch_size
    params: Params = {
        "patch_embed": {
            "text_proj": _lin(sd, "patch_embed.text_proj"),
        },
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "norm_final": {"weight": sd["norm_final.weight"],
                       "bias": sd["norm_final.bias"]},
        "norm_out": {
            "linear": _lin(sd, "norm_out.linear"),
            "norm": {"weight": sd["norm_out.norm.weight"],
                     "bias": sd["norm_out.norm.bias"]},
        },
        "proj_out": _lin(sd, "proj_out"),
    }
    if cfg.patch_size_t is None:
        pe = sd["patch_embed.proj.weight"]     # Conv2d [D, C, p, p]
        params["patch_embed"]["proj"] = {
            "kernel": np.ascontiguousarray(pe.reshape(d, -1).T),
            "bias": sd["patch_embed.proj.bias"],
        }
    else:
        params["patch_embed"]["proj"] = _lin(sd, "patch_embed.proj")
    if "patch_embed.pos_embedding" in sd:
        params["patch_embed"]["pos_embedding"] = sd["patch_embed.pos_embedding"]
    if cfg.ofs_embed_dim:
        params["ofs_embedding"] = {
            "linear_1": _lin(sd, "ofs_embedding.linear_1"),
            "linear_2": _lin(sd, "ofs_embedding.linear_2"),
        }

    layers = []
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}."
        layers.append({
            "norm1": {
                "linear": _lin(sd, b + "norm1.linear"),
                "norm": {"weight": sd[b + "norm1.norm.weight"],
                         "bias": sd[b + "norm1.norm.bias"]},
            },
            "attn1": {
                "to_q": _lin(sd, b + "attn1.to_q"),
                "to_k": _lin(sd, b + "attn1.to_k"),
                "to_v": _lin(sd, b + "attn1.to_v"),
                "to_out": _lin(sd, b + "attn1.to_out.0"),
                "norm_q": {"weight": sd[b + "attn1.norm_q.weight"],
                           "bias": sd[b + "attn1.norm_q.bias"]},
                "norm_k": {"weight": sd[b + "attn1.norm_k.weight"],
                           "bias": sd[b + "attn1.norm_k.bias"]},
            },
            "norm2": {
                "linear": _lin(sd, b + "norm2.linear"),
                "norm": {"weight": sd[b + "norm2.norm.weight"],
                         "bias": sd[b + "norm2.norm.bias"]},
            },
            "ff": {
                "fc1": _lin(sd, b + "ff.net.0.proj"),
                "fc2": _lin(sd, b + "ff.net.2"),
            },
        })
    params["blocks"] = _stack(layers)
    import jax
    return jax.tree.map(jnp.asarray, params)


def cogvideox_dit_to_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    """Inverse mapping for round-trip validation / export."""
    d = cfg.inner_dim
    p = cfg.patch_size
    sd: Dict[str, np.ndarray] = {}

    def put_lin(name, pr):
        sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(pr["kernel"]).T)
        if "bias" in pr:
            sd[f"{name}.bias"] = np.asarray(pr["bias"])

    pe = params["patch_embed"]
    if cfg.patch_size_t is None:
        k = np.asarray(pe["proj"]["kernel"])
        sd["patch_embed.proj.weight"] = np.ascontiguousarray(
            k.T.reshape(d, cfg.in_channels, p, p))
        sd["patch_embed.proj.bias"] = np.asarray(pe["proj"]["bias"])
    else:
        put_lin("patch_embed.proj", pe["proj"])
    put_lin("patch_embed.text_proj", pe["text_proj"])
    if "pos_embedding" in pe:
        sd["patch_embed.pos_embedding"] = np.asarray(pe["pos_embedding"])
    put_lin("time_embedding.linear_1", params["time_embedding"]["linear_1"])
    put_lin("time_embedding.linear_2", params["time_embedding"]["linear_2"])
    sd["norm_final.weight"] = np.asarray(params["norm_final"]["weight"])
    sd["norm_final.bias"] = np.asarray(params["norm_final"]["bias"])
    put_lin("norm_out.linear", params["norm_out"]["linear"])
    sd["norm_out.norm.weight"] = np.asarray(params["norm_out"]["norm"]["weight"])
    sd["norm_out.norm.bias"] = np.asarray(params["norm_out"]["norm"]["bias"])
    put_lin("proj_out", params["proj_out"])
    if "ofs_embedding" in params:
        put_lin("ofs_embedding.linear_1", params["ofs_embedding"]["linear_1"])
        put_lin("ofs_embedding.linear_2", params["ofs_embedding"]["linear_2"])

    from frameino_tpu.core.tree import unstack_layers
    for i, lp in enumerate(unstack_layers(params["blocks"], cfg.num_layers)):
        b = f"transformer_blocks.{i}."
        for nn in ("norm1", "norm2"):
            put_lin(b + f"{nn}.linear", lp[nn]["linear"])
            sd[b + f"{nn}.norm.weight"] = np.asarray(lp[nn]["norm"]["weight"])
            sd[b + f"{nn}.norm.bias"] = np.asarray(lp[nn]["norm"]["bias"])
        put_lin(b + "attn1.to_q", lp["attn1"]["to_q"])
        put_lin(b + "attn1.to_k", lp["attn1"]["to_k"])
        put_lin(b + "attn1.to_v", lp["attn1"]["to_v"])
        put_lin(b + "attn1.to_out.0", lp["attn1"]["to_out"])
        for qn in ("norm_q", "norm_k"):
            sd[b + f"attn1.{qn}.weight"] = np.asarray(lp["attn1"][qn]["weight"])
            sd[b + f"attn1.{qn}.bias"] = np.asarray(lp["attn1"][qn]["bias"])
        put_lin(b + "ff.net.0.proj", lp["ff"]["fc1"])
        put_lin(b + "ff.net.2", lp["ff"]["fc2"])
    return sd


def load_cogvideox_dit_weights(path: str, cfg) -> Params:
    return cogvideox_dit_from_state_dict(load_safetensors_dir(path), cfg)


# ---------------------------------------------------------------------------
# CogVideoX VAE (diffusers AutoencoderKLCogVideoX state dict)
# ---------------------------------------------------------------------------

def _cog_cconv(sd, name):
    """CogVideoXCausalConv3d (wraps .conv) OIDHW -> DHWIO."""
    w = sd[f"{name}.conv.weight"]
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": sd[f"{name}.conv.bias"]}


def _cog_gn(sd, name):
    return {"weight": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _cog_sn(sd, name):
    """CogVideoXSpatialNorm3D: norm_layer + conv_y/conv_b causal convs."""
    return {
        "norm": _cog_gn(sd, f"{name}.norm_layer"),
        "conv_y": _cog_cconv(sd, f"{name}.conv_y"),
        "conv_b": _cog_cconv(sd, f"{name}.conv_b"),
    }


def _cog_res(sd, name, spatial_norm):
    p: Params = {
        "conv1": _cog_cconv(sd, f"{name}.conv1"),
        "conv2": _cog_cconv(sd, f"{name}.conv2"),
    }
    if spatial_norm:
        p["norm1"] = _cog_sn(sd, f"{name}.norm1")
        p["norm2"] = _cog_sn(sd, f"{name}.norm2")
    else:
        p["norm1"] = _cog_gn(sd, f"{name}.norm1")
        p["norm2"] = _cog_gn(sd, f"{name}.norm2")
    if f"{name}.conv_shortcut.conv.weight" in sd:
        p["conv_shortcut"] = _cog_cconv(sd, f"{name}.conv_shortcut")
    elif f"{name}.conv_shortcut.weight" in sd:
        w = sd[f"{name}.conv_shortcut.weight"]
        p["conv_shortcut"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": sd[f"{name}.conv_shortcut.bias"]}
    return p


def _cog_conv2d(sd, name):
    return {"kernel": np.ascontiguousarray(
        sd[f"{name}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{name}.bias"]}


def cogvideox_vae_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Params:
    import jax
    from frameino_tpu.core.tree import meta
    boc = cfg.block_out_channels
    enc: Params = {"conv_in": _cog_cconv(sd, "encoder.conv_in"),
                   "down_blocks": []}
    for i in range(len(boc)):
        base = f"encoder.down_blocks.{i}"
        blk = {"resnets": [_cog_res(sd, f"{base}.resnets.{j}", False)
                           for j in range(cfg.layers_per_block)],
               "downsampler": None,
               "compress_time": meta(i < cfg.temporal_compress_level)}
        if f"{base}.downsamplers.0.conv.weight" in sd:
            blk["downsampler"] = _cog_conv2d(sd, f"{base}.downsamplers.0.conv")
        enc["down_blocks"].append(blk)
    enc["mid"] = {"resnets": [
        _cog_res(sd, f"encoder.mid_block.resnets.{j}", False)
        for j in range(2)]}
    enc["norm_out"] = _cog_gn(sd, "encoder.norm_out")
    enc["conv_out"] = _cog_cconv(sd, "encoder.conv_out")

    dec: Params = {"conv_in": _cog_cconv(sd, "decoder.conv_in"),
                   "mid": {"resnets": [
                       _cog_res(sd, f"decoder.mid_block.resnets.{j}", True)
                       for j in range(2)]},
                   "up_blocks": []}
    for i in range(len(boc)):
        base = f"decoder.up_blocks.{i}"
        blk = {"resnets": [_cog_res(sd, f"{base}.resnets.{j}", True)
                           for j in range(cfg.layers_per_block + 1)],
               "upsampler": None,
               "compress_time": meta(i < cfg.temporal_compress_level)}
        if f"{base}.upsamplers.0.conv.weight" in sd:
            blk["upsampler"] = _cog_conv2d(sd, f"{base}.upsamplers.0.conv")
        dec["up_blocks"].append(blk)
    dec["norm_out"] = _cog_sn(sd, "decoder.norm_out")
    dec["conv_out"] = _cog_cconv(sd, "decoder.conv_out")
    return jax.tree.map(jnp.asarray, {"encoder": enc, "decoder": dec})


def load_cogvideox_vae_weights(path: str, cfg) -> Params:
    return cogvideox_vae_from_state_dict(load_safetensors_dir(path), cfg)
