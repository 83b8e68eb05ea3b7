"""Interactive web UI (streamlit), mirroring the reference's web apps.

The reference wraps every inference workflow in Streamlit pages launched by
unittest-method launchers (exp/cips3d/models/render_video_web_v10.py +
tl2 run_web). Here the same workflows are importable pure functions
(apps/sample.py, apps/inversion.py) and the UI is a thin optional layer:

    pip install streamlit   # not bundled
    streamlit run -m cips3dpp_tpu.apps.web -- --cfg configs/ffhq.yaml \
        --section sample_multi_view

Every mode is equally reachable headless through apps/cli.py; the UI adds
interactive sliders for truncation / trajectory / seeds and live previews.
"""

from __future__ import annotations

import sys


def main():
    try:
        import streamlit as st
    except ImportError:
        print(
            "streamlit is not installed; use the CLI instead:\n"
            "  python -m cips3dpp_tpu.apps.cli sample-multi-view ...",
            file=sys.stderr,
        )
        return 1

    import argparse

    import numpy as np
    import jax

    from ..io.config import load_command_config, apply_overrides
    from .cli import _build_generator, _load_params
    from .sample import (
        yaw_trajectory,
        circle_trajectory,
        translate_rotate_trajectory,
        render_trajectory,
        style_mixing_grid,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default=None)
    parser.add_argument("--section", type=str, default=None)
    parser.add_argument("--opts", nargs="*", default=[])
    args = parser.parse_args()

    cfg = {}
    if args.cfg:
        cfg = apply_overrides(
            load_command_config(args.cfg, args.section), args.opts
        )

    st.set_page_config(page_title="CIPS-3D++ TPU")
    st.title("CIPS-3D++ TPU")

    mode = st.sidebar.selectbox(
        "mode", ["multi_view", "style_mixing"], index=0
    )
    seed = int(st.sidebar.number_input("seed", value=0, step=1))
    truncation = float(st.sidebar.slider("truncation", 0.0, 1.0, 0.7))

    @st.cache_resource
    def get_model():
        model, gcfg = _build_generator(cfg)
        params = _load_params(model, gcfg, cfg)
        means = model.apply(
            params, jax.random.PRNGKey(2), 10_000, method="mean_latents"
        )
        return model, gcfg, params, means

    model, gcfg, params, means = get_model()

    def to_u8(img):
        return ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)

    if mode == "multi_view":
        view_mode = st.sidebar.selectbox(
            "view_mode", ["yaw", "circle", "translate_rotate"]
        )
        n_frames = int(st.sidebar.number_input("N_frames", value=16, step=4))
        if st.button("render"):
            key = jax.random.PRNGKey(seed)
            k1, k2 = jax.random.split(key)
            zs = (
                jax.random.normal(k1, (1, gcfg.mapping.z_dim)),
                jax.random.normal(k2, (1, gcfg.mapping.z_dim)),
            )
            traj = {
                "yaw": yaw_trajectory,
                "circle": circle_trajectory,
                "translate_rotate": translate_rotate_trajectory,
            }[view_mode](n_frames, gcfg.img_size)
            out = render_trajectory(
                model, params, zs, traj, truncation=truncation,
                mean_latents=means,
            )
            st.image([to_u8(f) for f in out["rgb"][:: max(1, n_frames // 8)]])
    else:
        rows = int(st.sidebar.number_input("rows", value=3, step=1))
        cols = int(st.sidebar.number_input("cols", value=3, step=1))
        if st.button("render grid"):
            from ..core.camera import camera_from_angles
            import jax.numpy as jnp

            cam = camera_from_angles(
                jnp.zeros(1), jnp.zeros(1), gcfg.img_size,
                fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius,
            )
            grid = style_mixing_grid(
                model, params, jax.random.PRNGKey(seed), rows, cols, cam,
                truncation=truncation, mean_latents=means,
            )
            st.image(to_u8(grid))
    return 0


if __name__ == "__main__":
    sys.exit(main())
