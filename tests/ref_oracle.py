"""Load the reference's torch Generator (exp/cips3d/models/model_v3.py:809)
on CPU as a parity oracle.

The reference's v10 forward path only needs a handful of its heavyweight
imports at *call* time when mesh/noise-projection features are off, so this
module stubs exactly the import surface (pytorch3d, tl2, trimesh, skimage,
and the CUDA extension loader) and imports the reference sources verbatim
from /root/reference. The `op` package's own CPU fallbacks
(exp/op/fused_act.py:104-119, exp/op/upfirdn2d.py:160-201) provide the
fused-act / upfirdn2d semantics — i.e. the oracle runs the reference's own
code, not a re-implementation.

Nothing here ships in the package: it exists so tests can assert that the
JAX framework reproduces the reference's forward bit-for-convention
(offset z sampling, blur pads, bmm mod-conv, SIREN init usage, noise order)
without released checkpoints.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _InertStub:
    """Placeholder for classes/functions on code paths the oracle never
    takes (mesh rasterization, noise projection). Constructing is allowed
    (some appear in type annotations / default args); calling is not."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):  # pragma: no cover
        raise RuntimeError("reference-oracle stub was called")


def load_reference_model_v3():
    """Import and return the reference's model_v3 module (torch, CPU).

    Idempotent; installs sys.modules stubs on first call. Never writes to
    /root/reference (bytecode generation is disabled)."""
    if "exp.cips3d.models.model_v3" in sys.modules:
        return sys.modules["exp.cips3d.models.model_v3"]

    sys.dont_write_bytecode = True  # /root/reference is read-only

    # --- third-party stubs (unused on the v10 forward path) ---
    if "trimesh" not in sys.modules:
        _stub_module(
            "trimesh",
            load_mesh=_InertStub(),
            base=types.SimpleNamespace(Trimesh=_InertStub),
            remesh=types.SimpleNamespace(subdivide=_InertStub()),
        )
    if "skimage" not in sys.modules:
        sk = _stub_module("skimage")
        sk.measure = _stub_module("skimage.measure", marching_cubes=_InertStub())
    if "pytorch3d" not in sys.modules:
        p3d = _stub_module("pytorch3d")
        p3d.io = _stub_module("pytorch3d.io")
        p3d.structures = _stub_module("pytorch3d.structures", Meshes=_InertStub)
        p3d.transforms = _stub_module(
            "pytorch3d.transforms",
            matrix_to_euler_angles=_InertStub(),
            so3_exponential_map=_InertStub(),
        )
        renderer_names = [
            "TexturesUV", "look_at_view_transform", "FoVPerspectiveCameras",
            "PointLights", "RasterizationSettings", "MeshRenderer",
            "MeshRasterizer", "SoftPhongShader", "TexturesVertex",
            "HardPhongShader", "BlendParams",
        ]
        p3d.renderer = _stub_module(
            "pytorch3d.renderer", **{n: _InertStub for n in renderer_names}
        )
    if "tl2" not in sys.modules:
        tl2 = _stub_module("tl2")
        tl2.tl2_utils = _stub_module(
            "tl2.tl2_utils",
            get_class_repr=lambda obj, prefix=None, **k: (
                f"{prefix}.{type(obj).__name__}"
            ),
            dict2string=lambda dict_obj=None, **k: repr(dict_obj),
            print_repr=lambda *a, **k: None,
        )

        class _Registry:
            def register(self, *a, **k):
                def deco(cls):
                    return cls

                return deco

        tl2.proj = _stub_module("tl2.proj")
        tl2.proj.fvcore = _stub_module(
            "tl2.proj.fvcore", MODEL_REGISTRY=_Registry()
        )
        tl2.proj.pytorch = _stub_module("tl2.proj.pytorch")
        tl2.proj.pytorch.torch_utils = _stub_module(
            "tl2.proj.pytorch.torch_utils"
        )

    # --- the reference's own op CPU fallbacks, CUDA JIT build disabled ---
    import torch.utils.cpp_extension as cppext

    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "exp")):
        if p not in sys.path:
            sys.path.insert(0, p)

    orig_load = cppext.load
    cppext.load = lambda *a, **k: types.SimpleNamespace()
    try:
        import op  # noqa: F401 — reference exp/op package (CPU branches)
    finally:
        cppext.load = orig_load

    import exp.cips3d.models.model_v3 as model_v3  # noqa: E402

    return model_v3


def build_reference_generator(cfg):
    """Instantiate the reference Generator from a cips3dpp_tpu
    GeneratorConfig (the same dataclass the JAX Generator consumes), so the
    two sides are architecturally matched by construction."""
    model_v3 = load_reference_model_v3()

    gen = model_v3.Generator(
        enable_decoder=cfg.enable_decoder,
        freeze_renderer=cfg.freeze_renderer,
        renderer_detach=cfg.renderer_detach,
        renderer_cfg=dict(
            N_layers_renderer=cfg.renderer.n_layers,
            input_dim=cfg.renderer.input_dim,
            hidden_dim=cfg.renderer.hidden_dim,
            view_dim=cfg.renderer.view_dim,
            with_sdf=cfg.renderer.with_sdf,
            output_features=True,
        ),
        mapping_renderer_cfg=dict(
            z_dim=cfg.mapping.z_dim,
            style_dim=cfg.mapping.style_dim,
            N_layers=cfg.mapping.n_layers,
        ),
        decoder_cfg=dict(
            size_start=cfg.decoder.size_start,
            size_end=cfg.decoder.size_end,
            in_channel=cfg.renderer.hidden_dim,
            channel_multiplier=cfg.decoder.channel_multiplier,
            project_noise=False,
            upsample_list=list(cfg.decoder.upsample_list),
            kernel_size=cfg.decoder.kernel_size,
        ),
        mapping_decoder_cfg=dict(
            style_dim=cfg.decoder.style_dim,
            lr_mul_mapping=cfg.decoder.mapping_lr_mul,
            N_layers=cfg.decoder.mapping_n_layers,
        ),
    )
    return gen.eval()


def load_reference_discriminators():
    """The reference's discriminator modules (same stub environment)."""
    load_reference_model_v3()  # installs stubs + sys.path
    import exp.cips3d.models.discriminator as ref_d
    import exp.cips3d.models.discriminator_pose as ref_dp

    return ref_d, ref_dp
