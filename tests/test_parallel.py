"""Mesh placement helpers + SPMD training parity on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu import parallel


def test_mesh_and_placement(cpu_mesh):
    tree = {"per_env": jnp.ones((16, 3)), "scalar": jnp.float32(2.0),
            "table": jnp.arange(12.0).reshape(3, 4)}
    sharded = parallel.shard_leading_axis(tree, cpu_mesh)
    assert not sharded["per_env"].sharding.is_fully_replicated
    assert sharded["scalar"].sharding.is_fully_replicated
    # non-divisible leading dim falls back to replication
    assert sharded["table"].sharding.is_fully_replicated
    rep = parallel.replicate(tree, cpu_mesh)
    for v in jax.tree_util.tree_leaves(rep):
        assert v.sharding.is_fully_replicated


def test_data_parallel_mesh_from_cpu_devices(cpu_devices):
    mesh = parallel.data_parallel_mesh(4, devices=cpu_devices)
    assert mesh.devices.shape == (4,)
    assert mesh.axis_names == ("data",)


@pytest.mark.slow
def test_sharded_epoch_matches_unsharded(cpu_mesh):
    """One PPO epoch sharded over 8 virtual devices: rollout-level metrics
    (reward, alive ratio) must match the single-device run exactly — the SPMD
    layout changes placement, not rollout math. Update metrics (kl, losses)
    legitimately differ because minibatch shuffling is per-shard (as per-rank
    shuffling is in the reference's Horovod path), so they are only checked
    finite."""
    from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
    from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
    from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

    lib = make_synthetic_motion_lib(num_motions=2, T=30, fps=30.0, seed=0)

    def run(mesh):
        env = HumanoidImEnv(HumanoidImConfig(num_envs=16, substeps=2), lib,
                            rng=0)
        if mesh is not None:
            env = env.shard(mesh)
        agent = ImitationPPO(
            env, PPOConfig(horizon=4, minibatch_size=32, mini_epochs=1),
            seed=7, mesh=mesh)
        ts = agent.init_state()
        ts, m = agent.train_epoch(ts)
        return {k: float(v) for k, v in m.items()}

    m1 = run(None)
    m8 = run(cpu_mesh)
    for k in ("reward_mean", "alive_ratio"):
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
    assert all(np.isfinite(v) for v in m8.values()), m8


@pytest.mark.slow
def test_per_chip_minibatch_semantics(cpu_mesh):
    """`minibatch_per_chip=True` = the reference's Horovod data parallelism
    (each rank consumes its own LOCAL minibatches while gradients all-reduce,
    `common_agent.py:388-395`): dp× fewer optimizer steps than the global
    semantics at the same per-chip minibatch, finite metrics, and identical
    rollout-level numbers."""
    from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
    from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
    from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

    lib = make_synthetic_motion_lib(num_motions=2, T=30, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=16, substeps=2), lib,
                        rng=0)
    env = env.shard(cpu_mesh)
    agent = ImitationPPO(
        env, PPOConfig(horizon=4, minibatch_size=4, mini_epochs=1,
                       minibatch_per_chip=True),
        seed=7, mesh=cpu_mesh)
    # 16 envs * 4 horizon = 64 global, 8 local per chip, mb 4 -> 2 steps
    assert agent.num_minibatches == 2
    ts = agent.init_state()
    ts, m = agent.train_epoch(ts)
    assert all(np.isfinite(float(v)) for v in m.values()), m


@pytest.mark.slow
def test_local_sgd_per_mini_epoch_sync(cpu_mesh):
    """dp_sync='per_mini_epoch' (local SGD): shards step on their own
    minibatches and average params+moments once per mini-epoch — the DP
    strategy that keeps the SHIPPED amass_im hyperparameters efficient at
    multi-chip scale (6 all-reduces/epoch instead of ~1536). Metrics finite,
    learning direction preserved."""
    from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
    from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
    from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

    lib = make_synthetic_motion_lib(num_motions=2, T=30, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=16, substeps=2), lib,
                        rng=0).shard(cpu_mesh)
    agent = ImitationPPO(
        env, PPOConfig(horizon=4, minibatch_size=4, mini_epochs=2,
                       minibatch_per_chip=True, dp_sync="per_mini_epoch",
                       learning_rate=1e-4, lr_schedule="constant"),
        seed=7, mesh=cpu_mesh)
    ts = agent.init_state()
    for _ in range(2):
        ts, m = agent.train_epoch(ts)
        assert all(np.isfinite(float(v)) for v in m.values()), m
