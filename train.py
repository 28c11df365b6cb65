"""Train a VDN/QMIX policy on DMFB or MEDA (reference train.py CLI parity).

Usage (mirrors the reference README):
    python train.py dmfb --drop_num=4 --fov=9
    python train.py meda --drop_num=4
Artifacts land under data-<env>/TrainResult and data-<env>/model like the
reference (without the os.chdir side effect).
"""

from marl_dmfb_tpu.utils import apply_platform_env

apply_platform_env()

from marl_dmfb_tpu.config import get_train_args, make_env_from_args
from marl_dmfb_tpu.trainer import Trainer


def main(argv=None):
    args = get_train_args(argv)
    # multi-host SPMD: wire the JAX runtime across processes when a
    # coordinator is configured (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    # env vars, or TPU pod metadata via MARL_DMFB_DISTRIBUTED=1); after this
    # jax.devices() spans all hosts and the mesh below shards globally.
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_NUM_PROCESSES"
    ) or os.environ.get("MARL_DMFB_DISTRIBUTED"):
        from marl_dmfb_tpu.parallel.distributed import init_distributed

        init_distributed()
    from marl_dmfb_tpu.parallel.mesh import mesh_from_flag

    mesh = mesh_from_flag(args.mesh)
    if mesh is not None:
        print(f"mesh: {mesh.devices.size} devices, sharding env batch",
              flush=True)
    env = make_env_from_args(args)
    if args.vmap_seeds > 1:
        # K-seed farm: every seed is an independent training, vmapped into
        # one program (parallel/seedfarm.py).  Mesh + farm composition is
        # not wired (the farm IS the parallelism axis here).
        if mesh is not None:
            raise SystemExit("--vmap_seeds runs single-device; use --mesh=off")
        from marl_dmfb_tpu.parallel.seedfarm import run_farm

        args.update_env_info(env.env_info())
        run_farm(args, env, args.vmap_seeds)
        return
    trainer = Trainer(env, args, mesh=mesh)
    if args.load_model:
        # resume from a full-state checkpoint (params, target, optimizer,
        # epsilon, PRNG — unlike the reference, which reloads weights only)
        tag = args.load_model_name or "final"
        if tag.startswith(f"{args.ith_run}_"):
            tag = tag[len(f"{args.ith_run}_"):]
        trainer.load_model(tag.rstrip("_"))
    trainer.run(online_evaluate=args.online_eval)


if __name__ == "__main__":
    main()
