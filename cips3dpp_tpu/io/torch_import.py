"""PyTorch checkpoint importer: released CIPS-3D++ `G_ema.pth` -> param pytree.

The reference saves per-model torch state dicts (train_v10.py:496-522 via
Checkpointer); inference rebuilds G from the ckpt dir's config snapshot
(render_video_web_v10.py:1695-1723). This module maps that state-dict naming
(model_v3.py module tree: style.*, style_decoder.*, renderer.network.*,
decoder.{conv1,convs,to_rgbs}.*, sigmoid_beta) onto this framework's flax
variable tree, transposing torch layouts to TPU channel-last:

    Linear  (out, in)        -> (in, out)
    Conv    (out, in, kh, kw)-> (kh, kw, in, out)
    ModConv (1, out, in, k,k)-> (k, k, in, out)

Unused reference parameters (StyledConv's dead `bias`, Blur/Upsample FIR
buffers) are dropped; FusedLeakyReLU biases land in `act_bias`.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

import flax


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth state dict to numpy on CPU (no CUDA)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _t_linear(w):
    return np.ascontiguousarray(np.transpose(w))


def _t_conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_modconv(w):
    # (1, out, in, k, k) -> (k, k, in, out)
    return np.ascontiguousarray(np.transpose(w[0], (2, 3, 1, 0)))


def _siren_linear(dst, torch_sd, prefix):
    dst["weight"] = _t_linear(torch_sd[f"{prefix}.weight"])
    dst["bias"] = np.asarray(torch_sd[f"{prefix}.bias"])


def _film_siren(torch_sd, prefix):
    out = {
        "weight": _t_linear(torch_sd[f"{prefix}.weight"]),
        "bias": np.asarray(torch_sd[f"{prefix}.bias"]),
        "gamma": {},
        "beta": {},
    }
    _siren_linear(out["gamma"], torch_sd, f"{prefix}.gamma")
    _siren_linear(out["beta"], torch_sd, f"{prefix}.beta")
    return out


def _styled_conv(torch_sd, prefix):
    return {
        "conv": {
            "weight": _t_modconv(torch_sd[f"{prefix}.conv.weight"]),
            "modulation": {
                "weight": _t_linear(torch_sd[f"{prefix}.conv.modulation.weight"]),
                "bias": np.asarray(torch_sd[f"{prefix}.conv.modulation.bias"]),
            },
        },
        "noise": {"weight": np.asarray(torch_sd[f"{prefix}.noise.weight"])},
        "act_bias": np.asarray(torch_sd[f"{prefix}.activate.bias"]),
    }


def _to_rgb(torch_sd, prefix):
    return {
        "conv": {
            "weight": _t_modconv(torch_sd[f"{prefix}.conv.weight"]),
            "modulation": {
                "weight": _t_linear(torch_sd[f"{prefix}.conv.modulation.weight"]),
                "bias": np.asarray(torch_sd[f"{prefix}.conv.modulation.bias"]),
            },
        },
        # (1, 3, 1, 1) -> (3,)
        "bias": np.asarray(torch_sd[f"{prefix}.bias"]).reshape(-1),
    }


def import_generator_state_dict(
    torch_sd: Mapping[str, np.ndarray],
    n_renderer_layers: int,
    n_decoder_blocks: int,
    n_mapping_layers: int = 3,
    n_decoder_mapping_layers: int = 5,
) -> dict:
    """Build the flax variables dict {'params': ...} for models.Generator.

    n_decoder_blocks = log2(size_end) - log2(size_start) (8 for the r1024
    decoder: convs has 2*8 entries, to_rgbs 8)."""
    p: dict = {}

    # NeRF mapping: torch Sequential style.{i} of MappingLinear
    for i in range(n_mapping_layers):
        p[f"style_{i}"] = {
            "weight": _t_linear(torch_sd[f"style.{i}.weight"]),
            "bias": np.asarray(torch_sd[f"style.{i}.bias"]),
        }

    # decoder mapping: Sequential [PixelNorm, EqualLinear x N] -> indices 1..N
    for i in range(n_decoder_mapping_layers):
        p[f"style_decoder_{i}"] = {
            "weight": _t_linear(torch_sd[f"style_decoder.{i + 1}.weight"]),
            "bias": np.asarray(torch_sd[f"style_decoder.{i + 1}.bias"]),
        }

    # renderer
    renderer = {
        "sigmoid_beta": np.asarray(torch_sd["renderer.sigmoid_beta"]),
        "network": {},
    }
    net = renderer["network"]
    for i in range(n_renderer_layers):
        net[f"pts_{i}"] = _film_siren(torch_sd, f"renderer.network.pts_linears.{i}")
    net["views"] = _film_siren(torch_sd, "renderer.network.views_linears")
    net["rgb_head"] = {}
    _siren_linear(net["rgb_head"], torch_sd, "renderer.network.rgb_linear")
    net["sigma_head"] = {}
    _siren_linear(net["sigma_head"], torch_sd, "renderer.network.sigma_linear")
    p["renderer"] = renderer

    # decoder
    dec = {
        "conv1": _styled_conv(torch_sd, "decoder.conv1"),
        "to_rgb1": _to_rgb(torch_sd, "decoder.to_rgb1"),
    }
    for i in range(2 * n_decoder_blocks):
        dec[f"convs_{i}"] = _styled_conv(torch_sd, f"decoder.convs.{i}")
    for i in range(n_decoder_blocks):
        dec[f"to_rgbs_{i}"] = _to_rgb(torch_sd, f"decoder.to_rgbs.{i}")
    p["decoder"] = dec

    import jax.numpy as jnp

    return {"params": flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flax.traverse_util.flatten_dict(p).items()}
    )}


#: state-dict keys the importer intentionally ignores: Blur/Upsample FIR
#: buffers (constants rebuilt from blur_kernel) and fixed noise buffers
#: (explicit arrays in this framework, model_v3.py:1044-1046).
IGNORED_KEY_MARKERS = (".kernel", "noises.", "noise_")


def state_dict_manifest(variables: dict) -> dict:
    """Expected torch state-dict {key: shape}, auto-derived from the flax
    variable tree via the inverse (export) mapping — the architecture is the
    single source of truth, so a released `G_ema.pth` that doesn't match it
    fails loudly instead of importing garbage."""
    return {
        k: tuple(np.asarray(v).shape)
        for k, v in export_generator_state_dict(variables).items()
    }


def validate_torch_state_dict(
    torch_sd: Mapping[str, np.ndarray], variables: dict, strict: bool = True
) -> dict:
    """Check a torch state dict against the architecture-derived manifest.

    Returns {"missing": [...], "shape_mismatch": {key: (want, got)},
    "ignored": [...], "unexpected": [...]}. With strict=True raises
    ValueError on missing keys or shape mismatches (unexpected extra keys
    only warn — forward-compatible with reference-side additions)."""
    manifest = state_dict_manifest(variables)
    missing = sorted(k for k in manifest if k not in torch_sd)
    shape_mismatch = {
        k: (manifest[k], tuple(np.asarray(torch_sd[k]).shape))
        for k in manifest
        if k in torch_sd and tuple(np.asarray(torch_sd[k]).shape) != manifest[k]
    }
    extra = [k for k in torch_sd if k not in manifest]
    ignored = sorted(
        k for k in extra if any(m in k for m in IGNORED_KEY_MARKERS)
    )
    unexpected = sorted(set(extra) - set(ignored))
    report = {
        "n_expected": len(manifest),
        "n_matched": len(manifest) - len(missing) - len(shape_mismatch),
        "missing": missing,
        "shape_mismatch": shape_mismatch,
        "ignored": ignored,
        "unexpected": unexpected,
    }
    if strict and (missing or shape_mismatch):
        lines = [
            f"torch state dict does not match the model architecture "
            f"({report['n_matched']}/{report['n_expected']} keys match):"
        ]
        for k in missing[:20]:
            lines.append(f"  missing: {k}  (want shape {manifest[k]})")
        for k, (want, got) in list(shape_mismatch.items())[:20]:
            lines.append(f"  shape mismatch: {k}  want {want}, got {got}")
        if len(missing) > 20 or len(shape_mismatch) > 20:
            lines.append(
                f"  ... and {max(0, len(missing) - 20) + max(0, len(shape_mismatch) - 20)} more"
            )
        lines.append(
            "Check the G_cfg (renderer n_layers / decoder size_end / mapping "
            "depths) matches the checkpoint's config_command.yaml."
        )
        raise ValueError("\n".join(lines))
    return report


def export_generator_state_dict(variables: dict) -> dict:
    """Inverse mapping (flax -> torch names/layouts), for round-trip tests and
    for users exporting back to the reference toolchain."""
    params = variables["params"]
    out: dict[str, np.ndarray] = {}

    def inv_linear(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w)))

    def inv_modconv(w):
        w = np.asarray(w)  # (k,k,in,out)
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))[None]

    def put_siren(prefix, node):
        out[f"{prefix}.weight"] = inv_linear(node["weight"])
        out[f"{prefix}.bias"] = np.asarray(node["bias"])

    def put_film(prefix, node):
        put_siren(prefix, node)
        put_siren(f"{prefix}.gamma", node["gamma"])
        put_siren(f"{prefix}.beta", node["beta"])

    def put_styled(prefix, node):
        out[f"{prefix}.conv.weight"] = inv_modconv(node["conv"]["weight"])
        put_siren(f"{prefix}.conv.modulation", node["conv"]["modulation"])
        out[f"{prefix}.noise.weight"] = np.asarray(node["noise"]["weight"])
        out[f"{prefix}.activate.bias"] = np.asarray(node["act_bias"])
        # reference allocates an unused StyledConv.bias — emit zeros to match
        cout = np.asarray(node["act_bias"]).shape[0]
        out[f"{prefix}.bias"] = np.zeros((1, cout, 1, 1), np.float32)

    def put_torgb(prefix, node):
        out[f"{prefix}.conv.weight"] = inv_modconv(node["conv"]["weight"])
        put_siren(f"{prefix}.conv.modulation", node["conv"]["modulation"])
        out[f"{prefix}.bias"] = np.asarray(node["bias"]).reshape(1, -1, 1, 1)

    i = 0
    while f"style_{i}" in params:
        put_siren(f"style.{i}", params[f"style_{i}"])
        i += 1
    i = 0
    while f"style_decoder_{i}" in params:
        put_siren(f"style_decoder.{i + 1}", params[f"style_decoder_{i}"])
        i += 1

    out["renderer.sigmoid_beta"] = np.asarray(params["renderer"]["sigmoid_beta"])
    net = params["renderer"]["network"]
    i = 0
    while f"pts_{i}" in net:
        put_film(f"renderer.network.pts_linears.{i}", net[f"pts_{i}"])
        i += 1
    put_film("renderer.network.views_linears", net["views"])
    put_siren("renderer.network.rgb_linear", net["rgb_head"])
    put_siren("renderer.network.sigma_linear", net["sigma_head"])

    dec = params["decoder"]
    put_styled("decoder.conv1", dec["conv1"])
    put_torgb("decoder.to_rgb1", dec["to_rgb1"])
    i = 0
    while f"convs_{i}" in dec:
        put_styled(f"decoder.convs.{i}", dec[f"convs_{i}"])
        i += 1
    i = 0
    while f"to_rgbs_{i}" in dec:
        put_torgb(f"decoder.to_rgbs.{i}", dec[f"to_rgbs_{i}"])
        i += 1

    return out


# ===================================================================== Ds ==
# Discriminator import/export. The reference trains and checkpoints both
# discriminators next to G (train_v10.py:496-522); finetuning from a released
# training checkpoint needs their state dicts mapped too. Same layout rules
# as the generator mapping above; the progressive image D additionally owns
# Blur FIR buffers (`.kernel`, rebuilt constants — never mapped) and its
# final EqualLinear flattens a (C, 4, 4) activation CHANNEL-FIRST, so the
# (out, C*16) weight needs an input-dim permutation against this framework's
# channel-last flatten.
#
# torch module trees (reference):
#   D_StyleGAN_Progressive  (discriminator.py:130-261)
#     conv_in.{res}: ConvLayer[EqualConv2d, FusedLeakyReLU]      -> .0/.1
#     blocks.{res}:  ResBlock(conv1=ConvLayer[conv, act],
#                             conv2=ConvLayer[Blur, conv, act],
#                             skip =ConvLayer[Blur, conv])
#     final_conv: ConvLayer[conv, act]; final_linear: Sequential[EL, EL]
#   D_VolumeRender_Progressive  (discriminator_pose.py:220-325)
#     conv_in.{res}: VolumeRenderDiscConv2d(conv, activation)
#     blocks.{res}:  VolumeRenderResBlock(conv1/conv2=CoordConvLayer(
#                      conv=CoordConv2d(conv), activation), skip=...)
#     final_conv: VolumeRenderDiscConv2d(conv with bias)


def _inv_conv(w):
    """flax (kh, kw, in, out) -> torch (out, in, kh, kw)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _d_stylegan_pairs(params):
    """[(flax_path_tuple, torch_name, kind)] for DStyleGANProgressive.
    kind: 'conv' | 'vec' | 'lin0' | 'lin'."""
    pairs = []
    for name in params:
        if name.startswith("conv_in_"):
            res = name[len("conv_in_"):]
            pairs += [
                ((name, "EqualConv2d_0", "weight"),
                 f"conv_in.{res}.0.weight", "conv"),
                ((name, "act_bias"), f"conv_in.{res}.1.bias", "vec"),
            ]
        elif name.startswith("block_"):
            res = name[len("block_"):]
            pairs += [
                ((name, "conv1", "EqualConv2d_0", "weight"),
                 f"blocks.{res}.conv1.0.weight", "conv"),
                ((name, "conv1", "act_bias"),
                 f"blocks.{res}.conv1.1.bias", "vec"),
                ((name, "conv2", "EqualConv2d_0", "weight"),
                 f"blocks.{res}.conv2.1.weight", "conv"),
                ((name, "conv2", "act_bias"),
                 f"blocks.{res}.conv2.2.bias", "vec"),
                ((name, "skip", "EqualConv2d_0", "weight"),
                 f"blocks.{res}.skip.1.weight", "conv"),
            ]
    pairs += [
        (("final", "final_conv", "EqualConv2d_0", "weight"),
         "final_conv.0.weight", "conv"),
        (("final", "final_conv", "act_bias"), "final_conv.1.bias", "vec"),
        (("final", "final_linear_0", "weight"),
         "final_linear.0.weight", "lin0"),
        (("final", "final_linear_0", "bias"), "final_linear.0.bias", "vec"),
        (("final", "final_linear_1", "weight"),
         "final_linear.1.weight", "lin"),
        (("final", "final_linear_1", "bias"), "final_linear.1.bias", "vec"),
    ]
    return pairs


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def export_d_stylegan_state_dict(variables: dict) -> dict:
    """flax DStyleGANProgressive -> reference D_StyleGAN_Progressive names.
    Blur `.kernel` buffers are intentionally absent (rebuilt constants)."""
    params = variables["params"]
    out = {}
    for path, tname, kind in _d_stylegan_pairs(params):
        v = np.asarray(_get(params, path))
        if kind == "conv":
            out[tname] = _inv_conv(v)
        elif kind == "lin0":
            # flax flattens (4, 4, C) channel-last; torch (C, 4, 4)
            hwc, o = v.shape
            c = hwc // 16
            w = v.reshape(4, 4, c, o).transpose(2, 0, 1, 3).reshape(16 * c, o)
            out[tname] = np.ascontiguousarray(w.T)
        elif kind == "lin":
            out[tname] = np.ascontiguousarray(v.T)
        else:
            out[tname] = v
    return out


def import_d_stylegan_state_dict(
    torch_sd: Mapping[str, np.ndarray], variables_template: dict
) -> dict:
    """Inverse of export_d_stylegan_state_dict; the flax tree supplies the
    structure (input_size), the torch dict the values. The reference module
    registers ALL resolutions 8..1024 regardless of input_size — extra
    torch keys are ignored."""
    import jax
    import jax.numpy as jnp

    params = variables_template["params"]
    flat = dict(flax.traverse_util.flatten_dict(params))
    for path, tname, kind in _d_stylegan_pairs(params):
        v = np.asarray(torch_sd[tname])
        if kind == "conv":
            v = np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))
        elif kind == "lin0":
            o, chw = v.shape
            c = chw // 16
            v = np.ascontiguousarray(
                v.T.reshape(c, 4, 4, o).transpose(1, 2, 0, 3).reshape(16 * c, o)
            )
        elif kind == "lin":
            v = np.ascontiguousarray(v.T)
        want = flat[path].shape
        assert tuple(v.shape) == tuple(want), (tname, v.shape, want)
        flat[path] = jnp.asarray(v)
    return {"params": flax.traverse_util.unflatten_dict(flat)}


def _d_pose_pairs(params):
    """[(flax_path, torch_name, kind)] for DVolumeRenderProgressive."""
    pairs = []
    for name in params:
        if name.startswith("conv_in_"):
            res = name[len("conv_in_"):]
            pairs += [
                ((name, "weight"), f"conv_in.{res}.conv.weight", "conv"),
                ((name, "bias"), f"conv_in.{res}.activation.bias", "vec"),
            ]
        elif name.startswith("block_"):
            res = name[len("block_"):]
            for cv in ("conv1", "conv2"):
                pairs += [
                    ((name, cv, "conv", "weight"),
                     f"blocks.{res}.{cv}.conv.conv.weight", "conv"),
                    ((name, cv, "conv", "bias"),
                     f"blocks.{res}.{cv}.activation.bias", "vec"),
                ]
            if "skip" in params[name]:
                pairs += [
                    ((name, "skip", "weight"),
                     f"blocks.{res}.skip.conv.weight", "conv"),
                    ((name, "skip", "bias"),
                     f"blocks.{res}.skip.conv.bias", "vec"),
                ]
    pairs += [
        (("final_conv", "weight"), "final_conv.conv.weight", "conv"),
        (("final_conv", "bias"), "final_conv.conv.bias", "vec"),
    ]
    return pairs


def export_d_pose_state_dict(variables: dict) -> dict:
    params = variables["params"]
    out = {}
    for path, tname, kind in _d_pose_pairs(params):
        v = np.asarray(_get(params, path))
        out[tname] = _inv_conv(v) if kind == "conv" else v
    return out


def import_d_pose_state_dict(
    torch_sd: Mapping[str, np.ndarray], variables_template: dict
) -> dict:
    import jax.numpy as jnp

    params = variables_template["params"]
    flat = dict(flax.traverse_util.flatten_dict(params))
    for path, tname, kind in _d_pose_pairs(params):
        v = np.asarray(torch_sd[tname])
        if kind == "conv":
            v = np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))
        want = flat[path].shape
        assert tuple(v.shape) == tuple(want), (tname, v.shape, want)
        flat[path] = jnp.asarray(v)
    return {"params": flax.traverse_util.unflatten_dict(flat)}
