"""Training command implementation (kept out of cli.py for import weight)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def _setup(args, cfg):
    import jax
    from ..io.config import generator_config_from_dict, train_config_from_dict
    from ..models.generator import Generator
    from ..models.discriminator import DStyleGANProgressive
    from ..models.discriminator_pose import DVolumeRenderProgressive
    from ..parallel import make_mesh
    from ..train.train_loop import Trainer

    gcfg = generator_config_from_dict(cfg.get("G_cfg", {}))
    tcfg = train_config_from_dict(cfg)
    gen = Generator(gcfg)
    d_cfg = cfg.get("D_cfg", {})
    dr_cfg = cfg.get("D_renderer_cfg", {})
    d_dec = DStyleGANProgressive(
        input_size=d_cfg.get("input_size", 1024),
        channel_multiplier=d_cfg.get("channel_multiplier", 2),
        pretrained_size=d_cfg.get("pretrained_size"),
        diffaug=d_cfg.get("diffaug", False),
    )
    d_ren = DVolumeRenderProgressive(
        input_size=dr_cfg.get("input_size", 1024),
        viewpoint_loss=dr_cfg.get("viewpoint_loss", True),
        pretrained_size=dr_cfg.get("pretrained_size"),
    )
    n_dev = getattr(args, "n_devices", None)
    mesh = make_mesh(n_dev) if (n_dev or len(jax.devices()) > 1) else None

    trainer = Trainer(
        gen, d_dec, d_ren, gcfg, tcfg, args.outdir, mesh=mesh,
        config_snapshot=cfg,
    )
    return trainer, gcfg, tcfg


def run_sphere_init(args, cfg):
    import jax

    trainer, gcfg, tcfg = _setup(args, cfg)
    state = trainer.init_state(
        jax.random.PRNGKey(args.seed), (2, tcfg.data_img_size, tcfg.data_img_size, 3)
    )
    state = trainer.sphere_init(state, jax.random.PRNGKey(args.seed + 1),
                                n_iters=getattr(args, "n_iters", None))
    trainer.checkpointer().save(0, state, config=cfg)
    print(json.dumps({"ckpt": os.path.join(args.outdir, "ckpt"), "step": 0}))


def run_training(args, cfg):
    import jax
    from ..io.dataset import open_dataset, data_iterator

    trainer, gcfg, tcfg = _setup(args, cfg)
    state = trainer.init_state(
        jax.random.PRNGKey(args.seed), (2, tcfg.data_img_size, tcfg.data_img_size, 3)
    )

    start = 0
    if args.resume:
        restored, start = trainer.resume(state)
        if restored is not None:
            state = restored
            print(f"[train] resumed from step {start}", file=sys.stderr)

    if getattr(args, "finetune_dir", None) and start == 0:
        # Finetune (reference tl_finetune, train_v10.py:1225-1245): load all
        # models from the source run; G starts from G_ema.
        from ..io.checkpoint import CheckpointManager

        src = CheckpointManager(args.finetune_dir)
        restored = src.restore(state)
        state = restored.replace(
            params_g=jax.tree.map(lambda x: x.copy(), restored.params_g_ema),
            step=state.step,
        )
        print(f"[train] finetuning from {args.finetune_dir}", file=sys.stderr)

    if getattr(args, "init_renderer_from", None) and start == 0:
        # StyleSDF stage-1 -> stage-2 handoff (train_full_pipeline.py:484):
        # the trained volume renderer (G_ema side) seeds both G and G_ema;
        # decoder/Ds/optimizers stay freshly initialised.
        from ..io.checkpoint import CheckpointManager, graft_renderer

        src = CheckpointManager(args.init_renderer_from)
        raw = src.restore_raw()
        if raw is None:
            raise FileNotFoundError(
                f"no checkpoint found in {args.init_renderer_from}"
            )
        state = state.replace(
            params_g=graft_renderer(state.params_g, raw["params_g_ema"]),
            params_g_ema=graft_renderer(
                state.params_g_ema, raw["params_g_ema"]
            ),
        )
        print(f"[train] renderer grafted from {args.init_renderer_from}",
              file=sys.stderr)

    if tcfg.init_renderer and start == 0 and not args.no_sphere_init \
            and not getattr(args, "finetune_dir", None) \
            and not getattr(args, "init_renderer_from", None):
        state = trainer.sphere_init(state, jax.random.PRNGKey(args.seed + 1))

    ds = open_dataset(args.data, resolution=tcfg.data_img_size)
    it = data_iterator(ds, tcfg.batch, seed=args.seed)

    hooks = None
    if getattr(args, "fid_data", None):
        # in-training FID with best-fid checkpointing (train_v10.py:964-1060)
        from ..models.inception import init_inception, import_torch_inception
        from .eval_fid import eval_fid as run_fid
        from ..train.train_loop import TrainHooks

        if args.inception:
            from ..io.torch_import import load_torch_checkpoint

            incep = import_torch_inception(load_torch_checkpoint(args.inception))
        else:
            incep = init_inception(jax.random.PRNGKey(0))
        fid_ds = open_dataset(args.fid_data, resolution=tcfg.data_img_size)
        fid_it = data_iterator(fid_ds, 8, seed=1)
        n_eval = min(len(fid_ds), 512)

        def fid_hook(state):
            reals = (next(fid_it) for _ in range(max(n_eval // 8, 1)))
            res = run_fid(trainer.generator, state.params_g_ema, reals,
                          incep, n_fake=n_eval, batch_size=8)
            return res.fid

        hooks = TrainHooks(eval_fid=fid_hook)

    state = trainer.train(
        state, it, jax.random.PRNGKey(args.seed + 2),
        start_iter=start, total_iters=args.total_iters, hooks=hooks,
    )
    trainer.checkpointer().save(
        args.total_iters or tcfg.total_iters, state, config=cfg
    )
    print(json.dumps({"outdir": args.outdir, "done": True}))
